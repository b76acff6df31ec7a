package graft.streaming

import graft.compile.RuleCompiler
import graft.schema.Schema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming validation: the micro-batch analog of the
  * reference's fixed-interval recompute tick
  * (app/.../HomeViewModel.kt:61-81) and 30s tumbling window
  * (rust/src/lib.rs:192, app/.../TotpUtil.kt:32-41).
  *
  * All rule evaluation is the SAME compiled Column expressions as the
  * batch path (stateless projections — streaming-safe by construction);
  * only the windowed rollup adds event-time state, bounded by the
  * watermark.
  */
object StreamingValidator {

  /** Stateless per-row validation: input stream + `n_violations`. */
  def annotate(stream: DataFrame, schema: Schema): DataFrame =
    stream.withColumn("n_violations", RuleCompiler.violationCount(schema))

  /** Violation rows as a stream (explode + filter — still stateless). */
  def violations(stream: DataFrame, schema: Schema, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    stream
      .select(keys :+ explode(RuleCompiler.violationsArray(schema)).as("v"): _*)
      .where(col("v").isNotNull)
      .select(keys :+ col("v.field") :+ col("v.rule") :+ col("v.value")
        :+ col("v.severity"): _*)
  }

  /** Tumbling-window violation-rate verdicts per partition column:
    * `(window, partitionCol, n_rows, n_violations, pass)`. The
    * watermark bounds state so the query runs indefinitely.
    */
  def windowedVerdicts(
      stream: DataFrame,
      schema: Schema,
      tsCol: String,
      partitionCol: String,
      windowLength: String = "30 seconds",
      watermarkDelay: String = "1 minute"
  ): DataFrame =
    annotate(stream, schema)
      .withColumn("__n_err", RuleCompiler.errorCount(schema))
      // Event time must be TIMESTAMP (parquet often yields TIMESTAMP_NTZ;
      // session TZ is pinned UTC so the cast is deterministic).
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(partitionCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_violations").cast("long")).as("n_violations"),
        // pass = no failing-channel (≥ error) violations, same as batch
        (sum(col("__n_err").cast("long")) === 0L).as("pass"))
}
