package graft.validate

import graft.compile.RuleCompiler
import graft.schema.{Schema, Severity}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Applies a compiled schema to a DataFrame and materializes the three
  * engine outputs mandated by the north rule:
  *
  *   - violation rows `(…keyCols, field, rule, value)` — normalized,
  *     one row per failed rule per input row (mirrors the reference's
  *     typed-error normalization, rust/src/lib.rs:28-46 →
  *     app/.../SecurityUtil.kt:146-160);
  *   - an annotated frame with a per-row `n_violations` count;
  *   - per-partition verdicts (see [[graft.verdict.Verdict]]).
  *
  * Violations are data, not exceptions: a bad row never fails the job
  * (reference semantics: per-row failures are skipped/nulled, e.g.
  * app/.../HomeViewModel.kt:70-74).
  *
  * Plan shape: single scan → project(array of when-structs) → explode →
  * filter(isNotNull) — all inside one WholeStageCodegen span; no UDFs,
  * no higher-order functions.
  */
object Validator {

  /** Input frame + per-row violation count (cheap: integer flags only). */
  def annotate(df: DataFrame, schema: Schema): DataFrame =
    df.withColumn("n_violations", RuleCompiler.violationCount(schema))

  /** Normalized violation rows `(…keyCols, field, rule, value,
    * severity)`. `keyCols` identify the offending row (e.g. repo, path,
    * commit — or doc_id).
    */
  def violations(df: DataFrame, schema: Schema, keyCols: Seq[String]): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    df.select(keys :+ explode(RuleCompiler.violationsArray(schema)).as("v"): _*)
      .where(col("v").isNotNull)
      .select(keys :+ col("v.field") :+ col("v.rule") :+ col("v.value")
        :+ col("v.severity"): _*)
  }

  /** Rows with zero violations (the validated/clean subset). */
  def clean(df: DataFrame, schema: Schema): DataFrame =
    annotate(df, schema).where(col("n_violations") === 0).drop("n_violations")

  /** Structural (table-level) schema check — the Cerberus
    * `allow_unknown` analog plus its converse. Row-level rules cannot
    * even compile against a frame missing a declared column (Catalyst
    * resolution fails), so this is the pre-gate a pipeline runs before
    * [[violations]]:
    *
    *   - `unknown`: a frame column no schema field declares (Cerberus
    *     rejects unknown document keys unless allow_unknown; severity
    *     error unless the column is listed in `allowUnknown`, then no
    *     row at all);
    *   - `missing`: a declared field whose path does not resolve in the
    *     frame — error when the field is `required`, warning otherwise
    *     (its value rules are vacuously unenforceable).
    *
    * Dotted field paths resolve through nested structs, mirroring the
    * row-level compiler. Output mirrors [[violations]] minus key
    * columns: `(field, rule, value, severity)` with `value` = the
    * actual Spark type (unknown) or null (missing). Driver-side
    * metadata only — no job runs.
    */
  def schemaViolations(
      df: DataFrame,
      schema: Schema,
      allowUnknown: Set[String] = Set.empty): DataFrame = {
    import org.apache.spark.sql.types.{StructType, DataType}
    def resolve(t: DataType, path: List[String]): Option[DataType] =
      (t, path) match {
        case (dt, Nil) => Some(dt)
        case (st: StructType, head :: rest) =>
          st.fields.find(_.name == head).flatMap(f => resolve(f.dataType, rest))
        case _ => None
      }
    val declaredRoots = schema.fieldNames.map(_.split('.').head).toSet
    val unknown = df.schema.fields.toSeq
      .filter(f => !declaredRoots.contains(f.name) && !allowUnknown.contains(f.name))
      .map(f => (f.name, "unknown", f.dataType.simpleString, Severity.Error))
    val missing = schema.fields
      .filter { case (name, _) =>
        resolve(df.schema, name.split('.').toList).isEmpty
      }
      .map { case (name, spec) =>
        (name, "missing", null.asInstanceOf[String],
          if (spec.required) Severity.Error else Severity.Warning)
      }
    val spark = df.sparkSession
    import spark.implicits._
    (unknown ++ missing).toDF("field", "rule", "value", "severity")
  }

  /** ONE-pass quarantine routing: annotate with the error count and
    * write clean and quarantined rows as sibling partitions of one
    * table (`.../__quarantined=false|true/`). The corpus is scanned
    * and validated exactly once — the naive clean/bad split runs the
    * whole rule projection twice; at 100 TB the second scan is the
    * difference. Warnings do NOT quarantine (severity semantics,
    * E3). Downstream readers partition-prune:
    * `spark.read.parquet(path).where(col("__quarantined") === "false")`
    * never touches quarantined files (partition values read back as
    * STRINGS — Spark's partition-type inference covers numerics/dates,
    * not booleans).
    *
    * Returns (nClean, nQuarantined) counted from the written table —
    * parquet metadata counts, no data re-scan.
    */
  def writeQuarantined(
      df: DataFrame,
      schema: Schema,
      path: String): (Long, Long) = {
    df.withColumn("__n_errors", RuleCompiler.errorCount(schema))
      .withColumn("__quarantined", col("__n_errors") > 0)
      .drop("__n_errors")
      .write
      .mode("overwrite")
      .partitionBy("__quarantined")
      .parquet(path)
    val counts = df.sparkSession.read.parquet(path)
      .groupBy(col("__quarantined").cast("boolean"))
      .count()
      .collect()
      .map(r => r.getBoolean(0) -> r.getLong(1))
      .toMap
    (counts.getOrElse(false, 0L), counts.getOrElse(true, 0L))
  }

  /** Per-ELEMENT validation of an `array<struct>` column — the Cerberus
    * `schema`-on-list rule (validate every element of the list against
    * a sub-schema; the reference's strict deserialization validates
    * each element of `Vec<Account>`, rust/src/lib.rs:81-83).
    *
    * `elemSchema` field names are relative to the element struct
    * (including its `dependencies`, which reference SIBLING element
    * fields). Output rows mirror [[violations]] but with INDEXED field
    * paths: `arrayCol[3].name` — so downstream verdict rollups consume
    * element violations exactly like row violations.
    *
    * Null/empty arrays produce no element violations (whether the array
    * may be null/empty is the ARRAY field's own rule, validated by the
    * normal row schema). Plan: posexplode → the same compiled when-
    * struct projection as the row path → filter — one codegen stage,
    * still shuffle-free; row amplification is the array cardinality,
    * which is the irreducible cost of per-element semantics.
    */
  def elementViolations(
      df: DataFrame,
      elemSchema: Schema,
      arrayCol: String,
      keyCols: Seq[String]): DataFrame = {
    val prefixed = Schema(elemSchema.fields.map { case (name, spec) =>
      (s"__elem.$name",
        spec.copy(dependencies = spec.dependencies.map { case (k, v) =>
          (s"__elem.$k", v)
        }))
    })
    val keys: Seq[Column] = keyCols.map(col)
    val exploded = df.select(keys :+ posexplode(col(arrayCol)): _*)
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__elem")
    val structs = RuleCompiler.compile(prefixed).map { r =>
      when(
        r.fails,
        struct(
          concat(lit(s"$arrayCol["), col("__pos"), lit("]."),
            lit(r.field.stripPrefix("__elem."))).as("field"),
          lit(r.rule).as("rule"),
          r.value.as("value"),
          lit(r.severity).as("severity")))
    }
    exploded
      .select(keys :+ explode(array(structs: _*)).as("v"): _*)
      .where(col("v").isNotNull)
      .select(keys :+ col("v.field") :+ col("v.rule") :+ col("v.value")
        :+ col("v.severity"): _*)
  }

  /** Re-aggregated element-violation counts per input row: `(…keyCols,
    * n_elem_violations, n_elem_errors)` — the per-row rollup that joins
    * back against the parent frame (rows with no element violations are
    * absent; treat as zero).
    */
  def elementViolationCounts(
      df: DataFrame,
      elemSchema: Schema,
      arrayCol: String,
      keyCols: Seq[String]): DataFrame =
    elementViolations(df, elemSchema, arrayCol, keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_elem_violations"),
        sum(when(col("severity") === graft.schema.Severity.Warning, 0L)
          .otherwise(1L)).as("n_elem_errors"))
}
