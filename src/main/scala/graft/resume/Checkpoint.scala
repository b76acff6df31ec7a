package graft.resume

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/resume manifest — the engine's commit protocol.
  *
  * Semantics model: the reference's versioned, self-describing snapshot
  * with validate-all-then-commit (backup envelope rust/src/lib.rs:102-135;
  * import replaces state only after full validation,
  * app/.../HomeViewModel.kt:168-175). Here the unit of commit is one
  * input partition: its violations/verdict data is fully written BEFORE
  * its manifest row appears, so a crash leaves at worst a re-processable
  * partition, never a half-acknowledged one.
  *
  * Layout under `outDir` ("Iceberg-shaped" partitioned Parquet + an
  * explicit snapshot manifest — no Iceberg jars in this sandbox):
  * {{{
  *   outDir/violations/<partitionCol>=<v>/…   (dynamic-overwrite parquet)
  *   outDir/verdicts/…                        (append, keyed by run_id)
  *   outDir/manifest/…                        (append; one row per
  *                                             committed partition)
  * }}}
  *
  * Scale notes: the manifest is O(partitions) rows; resume is an
  * anti-join of the input's distinct partition values against it —
  * never a scan of prior results. A re-run of a crashed partition
  * overwrites only that partition's violation files (dynamic partition
  * overwrite), keeping publishes idempotent.
  */
object Checkpoint {

  val manifestSchema = "partition STRING, run_id STRING, n_rows LONG, " +
    "n_bad_rows LONG, n_violations LONG, pass BOOLEAN, " +
    "wall_ms LONG, completed_at LONG"

  def manifestPath(outDir: String): String = s"$outDir/manifest"

  /** All committed partition values (empty frame when no manifest yet). */
  def processed(spark: SparkSession, outDir: String): DataFrame = {
    val path = manifestPath(outDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.schema(manifestSchema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(manifestSchema))
  }

  /** Partition values present in the input but not yet committed —
    * left_anti against the (tiny, broadcast) manifest.
    */
  def pending(df: DataFrame, partitionCol: String, outDir: String): Seq[String] = {
    val spark = df.sparkSession
    val done = processed(spark, outDir)
      .select(col("partition"))
      .distinct()
    // Null partitions are mapped to the sentinel BEFORE the anti-join —
    // a raw null key would never match its manifest row and re-pend
    // forever.
    df.select(coalesce(col(partitionCol).cast("string"),
        lit(NullPartitionToken)).as("partition"))
      .distinct()
      .join(broadcast(done), Seq("partition"), "left_anti")
      .collect()
      .map(_.getString(0))
      .toSeq
  }

  /** Manifest rows use a sentinel for a NULL partition value so resume
    * can track it like any other partition.
    */
  val NullPartitionToken = "__NULL__"

  /** Input filter selecting exactly the rows of `pendingParts` (as
    * produced by [[pending]], sentinel included) — ONE predicate, so a
    * single Spark job processes every pending partition together
    * (partition/predicate pruning at the scan; no driver-side
    * per-partition loop). Shared by every resumable runner so the
    * slice semantics cannot drift from the manifest's.
    */
  def partitionFilter(
      partitionCol: String,
      pendingParts: Seq[String]): org.apache.spark.sql.Column = {
    val hasNull = pendingParts.contains(NullPartitionToken)
    val concrete = pendingParts.filterNot(_ == NullPartitionToken)
    val in =
      if (concrete.nonEmpty)
        col(partitionCol).cast("string").isin(concrete: _*)
      else lit(false)
    if (hasNull) in || col(partitionCol).isNull else in
  }

  /** Append manifest rows — the commit point. Called only after the
    * partition's data writes succeeded.
    */
  def commit(spark: SparkSession, outDir: String, entries: DataFrame): Unit =
    entries.write.mode(SaveMode.Append).parquet(manifestPath(outDir))
}
