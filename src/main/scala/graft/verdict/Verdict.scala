package graft.verdict

import graft.schema.Schema
import graft.validate.Validator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-partition pass/fail verdicts + metrics.
  *
  * Mirrors the reference's validate-all-then-commit shape: an import is
  * accepted only when every record passes (app/.../HomeViewModel.kt:
  * 168-175); here a partition passes only when it contributed zero
  * violations. Runs as one hash aggregate over integer flags (partial
  * aggregation map-side, no violation-row materialization).
  */
object Verdict {

  /** Verdict table: one row per value of `partitionCol` with
    * `(partitionCol, n_rows, n_bad_rows, n_violations, pass)`.
    */
  def compute(df: DataFrame, schema: Schema, partitionCol: String): DataFrame =
    Validator
      .annotate(df, schema)
      .groupBy(col(partitionCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("n_violations") > 0, 1L).otherwise(0L)).as("n_bad_rows"),
        sum(col("n_violations").cast("long")).as("n_violations"),
        (sum(col("n_violations").cast("long")) === 0L).as("pass")
      )
}
