package graft.validate

import graft.compile.RuleCompiler
import graft.schema.Schema
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
}
