package graft.resume

import graft.schema.Schema
import graft.validate.Validator
import graft.verdict.Verdict
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end resumable validation run: violations + per-partition
  * verdicts + lineage metrics, committed per partition via
  * [[Checkpoint]].
  *
  * One Spark job processes ALL pending partitions together (filter
  * `partitionCol isin pending` → predicate/partition pruning at the
  * scan) — no driver-side per-partition loop, so wall-clock does not
  * degrade with partition count. The manifest append AFTER the data
  * writes is the single commit point for every partition in the batch
  * (validate-all-then-commit, cf. reference import flow
  * app/.../HomeViewModel.kt:168-175).
  */
object ValidationRun {

  final case class Report(
      runId: String,
      pending: Seq[String],
      skipped: Long,
      verdicts: DataFrame
  )

  def run(
      df: DataFrame,
      schema: Schema,
      partitionCol: String,
      keyCols: Seq[String],
      outDir: String
  ): Report = {
    val spark = df.sparkSession
    val runId = java.util.UUID.randomUUID().toString
    val t0 = System.currentTimeMillis()

    val pendingParts = Checkpoint.pending(df, partitionCol, outDir)
    val done = Checkpoint.processed(spark, outDir).count()
    if (pendingParts.isEmpty)
      return Report(runId, Nil, done, Checkpoint.processed(spark, outDir))

    val slice = df.where(Checkpoint.partitionFilter(partitionCol, pendingParts))

    // Data writes first (per-partition dirs, dynamic overwrite keeps a
    // crashed-run retry idempotent) …
    Validator
      .violations(slice, schema, keyCols :+ partitionCol)
      .withColumn("run_id", lit(runId))
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(s"$outDir/violations")

    // Single source of verdict semantics (incl. severity channels).
    val verdicts = Verdict.compute(slice, schema, partitionCol)
      .withColumn("run_id", lit(runId))
    verdicts.write.mode(SaveMode.Append).parquet(s"$outDir/verdicts")

    // … then the manifest append is the commit point.
    val wallMs = System.currentTimeMillis() - t0
    val entries = spark.read
      .parquet(s"$outDir/verdicts")
      .where(col("run_id") === runId)
      .select(
        coalesce(col(partitionCol).cast("string"),
          lit(Checkpoint.NullPartitionToken)).as("partition"),
        col("run_id"),
        col("n_rows"),
        col("n_bad_rows"),
        col("n_violations"),
        col("pass"),
        lit(wallMs).as("wall_ms"),
        lit(System.currentTimeMillis()).as("completed_at"))
    Checkpoint.commit(spark, outDir, entries)

    Report(runId, pendingParts, done, verdicts)
  }
}
