package graft.verdict

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TABLE-level expectations (the dbt-test / Great-Expectations layer of
  * a validation engine): declarative aggregate invariants — row count,
  * null fraction, distinct cardinality, mean/min/max bounds — evaluated
  * over the whole table or per group. Row rules (graft.validate) catch
  * bad ROWS; expectations catch bad TABLES: a snapshot that is 40%
  * smaller than yesterday's, a column whose null rate doubled, a key
  * that stopped being unique — every row individually fine.
  *
  * Semantics grounding: the reference's import flow gates on a
  * TABLE-level property (imported list non-empty,
  * app/.../HomeViewModel.kt:168-177) before accepting any row — the
  * degenerate `row_count` expectation.
  *
  * Scale design: ALL expectations compile into ONE aggregation
  * (partial + final, map-side combine; one shuffle when grouped, none
  * global). `distinct` uses the exact count by default for verdict
  * stability — swap `approxDistinct = true` at 100 TB for the HLL
  * sketch (no Expand, same trade as `Induction.profile`). Output is one
  * row per (group ×) check: `(check, column, observed, lo, hi, pass)` —
  * verdicts are DATA, never exceptions (E4).
  */
object Expectations {

  /** One aggregate invariant: `observed(check, column)` must land in
    * `[lo, hi]`. Closed check vocabulary (misconfiguration rejected at
    * construction, not mid-job — E1):
    *
    *   - `row_count`  — rows in the table/group (`column` ignored: "")
    *   - `null_frac`  — fraction of NULL values in `column` (0 on an
    *     empty group: no rows, no nulls)
    *   - `distinct`   — distinct non-null values in `column`
    *   - `unique_frac` — distinct non-null values / rows in `column` —
    *     "the key stopped being unique" as ONE declared check
    *     (`Expect("unique_frac", "doc_id", lo = 1.0)`); a column with
    *     nulls can never reach 1.0 (nulls are not a key value). NULL —
    *     and so failing — on an empty group (0/0): no rows is "no
    *     signal", not "unique".
    *   - `mean` / `min` / `max` — over `column` cast to double
    *   - `quantile` — the exact interpolated `q`-quantile of `column`
    *     (Great-Expectations' median/quantile bounds; `q` defaults to
    *     0.5). Exact `percentile` is sort-based per group — the right
    *     default for verdict stability; at corpus scale swap
    *     `quantile_approx` (t-digest `approx_percentile`, accuracy
    *     pinned against exact in ExpectationsSpec, not
    *     oracle-replayable).
    *
    * Unbounded sides default to ±∞.
    */
  final case class Expect(
      check: String,
      column: String = "",
      lo: Double = Double.NegativeInfinity,
      hi: Double = Double.PositiveInfinity,
      q: Double = Double.NaN) {
    require(Expect.kinds.contains(check),
      s"unknown check '$check' (closed vocabulary: ${Expect.kinds.toSeq.sorted.mkString(", ")})")
    require(check == "row_count" || column.nonEmpty,
      s"check '$check' needs a column")
    require(lo <= hi, s"empty bound [$lo, $hi] for $check($column)")
    // q is quantile-only; setting it on another check is the typo'd-
    // check misconfiguration this closed vocabulary exists to reject.
    require(check.startsWith("quantile") || q.isNaN,
      s"q applies only to quantile checks, not '$check'")
    require(!check.startsWith("quantile") || q.isNaN || (q >= 0d && q <= 1d),
      s"quantile q must be in [0,1], got $q")

    /** The quantile actually evaluated (0.5 when unset); NaN for
      * non-quantile checks (reported as null in verdict rows).
      */
    def effectiveQ: Double =
      if (!check.startsWith("quantile")) Double.NaN
      else if (q.isNaN) 0.5
      else q
  }

  object Expect {
    val kinds: Set[String] =
      Set("row_count", "null_frac", "distinct", "unique_frac",
        "mean", "min", "max", "quantile", "quantile_approx")
  }

  private def observe(e: Expect, approxDistinct: Boolean): Column = {
    def nDistinct: Column =
      (if (approxDistinct) approx_count_distinct(col(e.column))
       else countDistinct(col(e.column))).cast("double")
    e.check match {
      case "row_count" => count(lit(1)).cast("double")
      case "null_frac" =>
        coalesce(avg(when(col(e.column).isNull, 1d).otherwise(0d)), lit(0d))
      case "distinct" => nDistinct
      case "unique_frac" =>
        // Explicit null on an empty table (never a 0/0 — ANSI mode
        // would throw mid-job): fails any bounded check, the same
        // no-signal-must-not-pass rule as an all-null mean.
        when(count(lit(1)) === 0, lit(null).cast("double"))
          .otherwise(nDistinct / count(lit(1)).cast("double"))
      case "mean" => avg(col(e.column).cast("double"))
      case "min" => min(col(e.column).cast("double"))
      case "max" => max(col(e.column).cast("double"))
      case "quantile" =>
        percentile(col(e.column).cast("double"), lit(e.effectiveQ))
      case "quantile_approx" =>
        approx_percentile(col(e.column).cast("double"), lit(e.effectiveQ),
          lit(10000))
    }
  }

  /** Evaluate every expectation in one aggregation. With `groupCols`,
    * one verdict row per (group, check) — per-partition expectations,
    * e.g. "every lang slice has ≥ 1000 rows". A NULL observed value
    * (mean/min/max over an all-null column) FAILS any bounded check —
    * "no signal" must not pass a gate that asked for one.
    */
  def evaluate(
      df: DataFrame,
      expects: Seq[Expect],
      groupCols: Seq[String] = Nil,
      approxDistinct: Boolean = false): DataFrame = {
    require(expects.nonEmpty, "evaluate needs at least one expectation")
    val aggs = expects.zipWithIndex.map { case (e, i) =>
      observe(e, approxDistinct).as(s"__obs$i")
    }
    val agged =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val rows = expects.zipWithIndex.map { case (e, i) =>
      val o = col(s"__obs$i")
      // q identifies WHICH quantile a row gates on (two quantile checks
      // on one column must stay distinguishable in the verdict table —
      // verdicts are data); null for non-quantile checks.
      val qCol =
        if (e.effectiveQ.isNaN) lit(null).cast("double") else lit(e.effectiveQ)
      struct(
        lit(e.check).as("check"),
        lit(e.column).as("column"),
        qCol.as("q"),
        o.as("observed"),
        lit(e.lo).as("lo"),
        lit(e.hi).as("hi"),
        coalesce(o >= e.lo && o <= e.hi, lit(false)).as("pass"))
    }
    agged.select(
      groupCols.map(col) :+ explode(array(rows: _*)).as("e"): _*)
      .select(groupCols.map(col) :+ col("e.*"): _*)
  }

  /** True iff every expectation passes — the table-level gate
    * (reference analog: reject the whole import when the table-level
    * property fails, app/.../HomeViewModel.kt:168-177).
    *
    * A GROUPED suite over an empty table produces zero groups and so
    * zero verdict rows; that must FAIL the gate, not vacuously pass it
    * — an empty snapshot is the exact catastrophe a row_count
    * expectation exists to catch.
    */
  def holds(
      df: DataFrame,
      expects: Seq[Expect],
      groupCols: Seq[String] = Nil,
      approxDistinct: Boolean = false): Boolean = {
    val r = evaluate(df, expects, groupCols, approxDistinct)
      .agg(count(lit(1)), sum(when(!col("pass"), 1L).otherwise(0L)))
      .first()
    r.getLong(0) > 0 && r.getLong(1) == 0L
  }
}
