package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, NumericType, StringType}

/** Schema inference (rule induction): profile a corpus once and derive
  * the strictest Cerberus [[Schema]] consistent with it — the bootstrap
  * step of a validation pipeline (profile a known-good snapshot, then
  * validate every later snapshot against the induced rules; drift
  * surfaces as violations instead of silent decay).
  *
  * Semantics grounding: the reference derives its record constraints
  * from observed data shape too — the fixed serde schema IS the strict
  * contract every later document must match (reference
  * rust/src/lib.rs:81-83); induction generalizes that to rule level.
  *
  * Scale design: [[profile]] is ONE global aggregation over the corpus
  * (the shared `ColumnStats.longFormat` single-pass scaffold; the only
  * caveat is `exact = true`, whose multi-column count-distinct plans an
  * Expand — ×fields row amplification — so the 100 TB path is the
  * default HLL sketch, same exact/approx split as
  * `ColumnStats.quantiles`). [[suggestSchema]] collects O(fields)
  * profile rows plus ONE more aggregation gathering every qualifying
  * `allowed` set (each bounded by `maxAllowed` values) — all
  * driver-side data is bounded by configuration, never by corpus size.
  */
object Induction {

  /** Per-field corpus profile, one row per field:
    * `(field, n_rows, n_null, null_frac, n_distinct, numeric_frac,
    * min_num, max_num, min_len, max_len)`. `numeric_frac` is the share
    * of NON-NULL values parseable as double (`try_cast` — ANSI-safe);
    * length stats are over the string rendering, so they are defined
    * for every column type.
    */
  def profile(
      df: DataFrame,
      fields: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(fields.nonEmpty, "profile needs at least one field")
    graft.stats.ColumnStats.longFormat(df, fields, groupCols = Nil,
      aggsFor = { f =>
        val c = col(f)
        val num = c.try_cast(DoubleType)
        Seq(
          count(lit(1)).as(s"__${f}__n"),
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"__${f}__n_null"),
          (if (exact) countDistinct(c) else approx_count_distinct(c))
            .as(s"__${f}__n_distinct"),
          count(num).as(s"__${f}__n_numeric"),
          min(num).as(s"__${f}__min_num"),
          max(num).as(s"__${f}__max_num"),
          min(length(c.cast(StringType))).cast("long").as(s"__${f}__min_len"),
          max(length(c.cast(StringType))).cast("long").as(s"__${f}__max_len"))
      },
      rowFor = { f =>
        val n = col(s"__${f}__n")
        val nonNull = n - col(s"__${f}__n_null")
        struct(
          lit(f).as("field"),
          n.as("n_rows"),
          col(s"__${f}__n_null").as("n_null"),
          when(n > 0, col(s"__${f}__n_null").cast("double") / n)
            .as("null_frac"),
          col(s"__${f}__n_distinct").as("n_distinct"),
          when(nonNull > 0,
            col(s"__${f}__n_numeric").cast("double") / nonNull)
            .as("numeric_frac"),
          col(s"__${f}__min_num").as("min_num"),
          col(s"__${f}__max_num").as("max_num"),
          col(s"__${f}__min_len").as("min_len"),
          col(s"__${f}__max_len").as("max_len"))
      })
  }

  /** The strictest [[Schema]] the profiled corpus satisfies:
    *   - never-null field → `required` + `nullable = false`; observed
    *     nulls → optional and nullable (nulls are evidently legal);
    *   - numeric field (frame-typed numeric, or a string column whose
    *     every non-null value parses) → observed `[min, max]` bounds,
    *     plus a `type` rule for the parseable-string case;
    *   - string field → observed length bounds, and when its exact
    *     cardinality is ≤ `maxAllowed`, the observed `allowed` set.
    *
    * By construction `Validator.violations(df, suggestSchema(df, …))`
    * is empty — the induced rules fire only on rows OUTSIDE the
    * profiled distribution (pinned in InductionSpec).
    *
    * Cardinality uses `exact = true` (an `allowed` set must not depend
    * on sketch error); pass a sampled frame at 100 TB if the Expand
    * cost matters — rule induction is a bootstrap step, not a per-run
    * one. Exactly two jobs: the profile pass, then one aggregation
    * collecting ALL qualifying `allowed` sets together (`collect_set`,
    * each bounded by `maxAllowed` values — never a per-field scan).
    */
  def suggestSchema(
      df: DataFrame,
      fields: Seq[String],
      maxAllowed: Int = 20): Schema = {
    val prof = profile(df, fields, exact = true).collect()
      .map(r => r.getAs[String]("field") -> r).toMap

    def hasNonNull(f: String) =
      prof(f).getAs[Long]("n_rows") > prof(f).getAs[Long]("n_null")
    def parsesNumeric(f: String) = hasNonNull(f) &&
      Option(prof(f).getAs[java.lang.Double]("numeric_frac")).exists(_ == 1.0)
    // Only fields the string branch below will actually consult:
    // fully-numeric strings take the numeric branch, so collecting
    // their value sets would be a wasted corpus aggregation.
    def isLowCardString(f: String) =
      df.schema(f).dataType == StringType && hasNonNull(f) &&
        !parsesNumeric(f) &&
        prof(f).getAs[Long]("n_distinct") <= maxAllowed

    val lowCard = fields.filter(isLowCardString)
    val allowedSets: Map[String, Seq[String]] =
      if (lowCard.isEmpty) Map.empty
      else {
        // slice() re-bounds the driver transfer to maxAllowed + 1 per
        // field even if the table changed between the profile pass and
        // this one (the two jobs are separate scans; the profile's
        // cardinality guard alone must not be the only thing standing
        // between a concurrent append and a driver OOM). An overflowing
        // set is discarded below rather than truncated — a clipped
        // `allowed` rule would reject values the corpus contains.
        val aggs = lowCard.map(f =>
          slice(sort_array(collect_set(col(f))), 1, maxAllowed + 1).as(f))
        val r = df.agg(aggs.head, aggs.tail: _*).first()
        lowCard.flatMap { f =>
          val vals = r.getSeq[String](r.fieldIndex(f))
          if (vals.size > maxAllowed) None else Some(f -> vals.sorted)
        }.toMap
      }

    val specs = fields.map { f =>
      val p = prof(f)
      val nNull = p.getAs[Long]("n_null")
      val frameNumeric =
        df.schema(f).dataType.isInstanceOf[NumericType]
      val base = FieldSpec(
        required = nNull == 0L,
        nullable = nNull > 0L)
      val spec =
        if (frameNumeric || parsesNumeric(f))
          base.copy(
            dtype = if (frameNumeric) None else Some(DoubleType: DataType),
            min = Option(p.getAs[java.lang.Double]("min_num")).map(_.toDouble),
            max = Option(p.getAs[java.lang.Double]("max_num")).map(_.toDouble))
        else if (df.schema(f).dataType == StringType && hasNonNull(f))
          base.copy(
            allowed = allowedSets.get(f),
            minLength = Option(p.getAs[java.lang.Long]("min_len")).map(_.toInt),
            maxLength = Option(p.getAs[java.lang.Long]("max_len")).map(_.toInt))
        else base
      f -> spec
    }
    Schema.of(specs: _*)
  }
}
