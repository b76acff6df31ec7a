package graft.verdict

import graft.compile.RuleCompiler
import graft.schema.Schema
import graft.validate.Validator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-partition pass/fail verdicts + metrics.
  *
  * Mirrors the reference's validate-all-then-commit shape: an import is
  * accepted only when every record passes (app/.../HomeViewModel.kt:
  * 168-175); here a partition passes only when it contributed zero
  * ERROR-severity violations. Warnings are data — reported, rolled up,
  * never failing (the reference's three outcome channels,
  * app/.../HomeViewModel.kt:179-185). Runs as one hash aggregate over
  * integer flags (partial aggregation map-side, no violation-row
  * materialization).
  */
object Verdict {

  /** Verdict table: one row per value of `partitionCol` with
    * `(partitionCol, n_rows, n_bad_rows, n_violations, n_warnings,
    * n_errors, worst_severity, pass)`. `pass` = zero violations on a
    * failing channel (severity ≥ error); `worst_severity` is the max
    * severity observed in the partition (null when clean).
    */
  def compute(df: DataFrame, schema: Schema, partitionCol: String): DataFrame =
    Validator
      .annotate(df, schema)
      .withColumn("__n_err", RuleCompiler.errorCount(schema))
      .withColumn("__n_warn", RuleCompiler.warningCount(schema))
      .withColumn("__worst", RuleCompiler.worstSeverityRank(schema))
      .groupBy(col(partitionCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("n_violations") > 0, 1L).otherwise(0L)).as("n_bad_rows"),
        sum(col("n_violations").cast("long")).as("n_violations"),
        sum(col("__n_warn").cast("long")).as("n_warnings"),
        sum(col("__n_err").cast("long")).as("n_errors"),
        RuleCompiler.severityName(max(col("__worst"))).as("worst_severity"),
        (sum(col("__n_err").cast("long")) === 0L).as("pass")
      )

  /** Per-(field, rule, severity) violation breakdown — the triage view
    * a user reads FIRST after a failed run: which rules fired, how
    * often, over how many distinct offending values, with value-range
    * examples. Built ON the violations table ([[Validator.violations]]
    * with no key columns — one projection source, so the breakdown can
    * never diverge from the rows it summarizes) + one hash aggregate
    * whose key space is bounded by the RULE count, not the data —
    * output is O(rules) rows at any corpus size. `example_min`/`_max`
    * order the reported value STRINGS lexicographically (the
    * violation `value` channel is a string by design);
    * `example_min_num`/`_max_num` give the true numeric range over the
    * values that parse as numbers (null when none do).
    *
    * The default exact distinct-value count plans the TWO-exchange
    * distinct-rewrite over the violation rows (bounded by distinct
    * (rule, value) pairs after partial aggregation, not corpus rows —
    * violations are minority rows by construction). At corpus scale
    * pass `approxDistinct = true` for the HLL++ sketch: ONE partial/
    * final exchange (PlanSpec-pinned) — the same exact/approx trade as
    * [[Expectations.evaluate]], with the same default (exactness for
    * verdict stability). Both paths sort-aggregate per partition: the
    * string example_min/max buffers are not hash-aggregable, and the
    * sort keys are O(rules) — the exchange count is what matters.
    */
  def ruleBreakdown(
      df: DataFrame,
      schema: Schema,
      approxDistinct: Boolean = false): DataFrame =
    Validator.violations(df, schema, Nil)
      .groupBy(col("field"), col("rule"), col("severity"))
      .agg(
        count(lit(1)).as("n_violations"),
        (if (approxDistinct) approx_count_distinct(col("value"))
         else countDistinct(col("value"))).as("n_distinct_values"),
        min(col("value")).as("example_min"),
        max(col("value")).as("example_max"),
        min(col("value").try_cast(org.apache.spark.sql.types.DoubleType))
          .as("example_min_num"),
        max(col("value").try_cast(org.apache.spark.sql.types.DoubleType))
          .as("example_max_num"))

  /** Rollup verdicts: every per-partition row PLUS the grand-total row
    * from ONE pass (`ROLLUP` reuses the partial aggregates — no second
    * scan of the input). `is_total = 1` marks the total row;
    * `grouping()` keeps it distinguishable from a genuinely-null
    * partition value.
    */
  def computeRollup(df: DataFrame, schema: Schema, partitionCol: String): DataFrame =
    Validator
      .annotate(df, schema)
      .withColumn("__n_err", RuleCompiler.errorCount(schema))
      .withColumn("__n_warn", RuleCompiler.warningCount(schema))
      .withColumn("__worst", RuleCompiler.worstSeverityRank(schema))
      .rollup(col(partitionCol))
      .agg(
        grouping(col(partitionCol)).cast("int").as("is_total"),
        count(lit(1)).as("n_rows"),
        sum(when(col("n_violations") > 0, 1L).otherwise(0L)).as("n_bad_rows"),
        sum(col("n_violations").cast("long")).as("n_violations"),
        sum(col("__n_warn").cast("long")).as("n_warnings"),
        sum(col("__n_err").cast("long")).as("n_errors"),
        RuleCompiler.severityName(max(col("__worst"))).as("worst_severity"),
        (sum(col("__n_err").cast("long")) === 0L).as("pass")
      )
}
