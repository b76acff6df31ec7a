package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The decode kernels are ***STUBS***: this container has no image or
  * audio codec libraries, so `decodeImageMeta` / `sampleFrames` /
  * `extractFeatures` parse a deterministic fake "header" from the raw
  * bytes instead of calling a real codec. Everything AROUND the stub is
  * real and load-bearing at scale:
  *
  *   - schema: (media_id, kind, bytes: binary, meta struct) — the shape
  *     a 100 TB multimodal table needs (bytes stay opaque, metadata is
  *     columnar and prunable);
  *   - batch shape: decode runs via `mapPartitions` over a typed
  *     Dataset — one iterator pass per partition, constant memory, the
  *     same contract a vectorized/Arrow decode batch would use;
  *   - partition sizing: [[repartitionForDecode]] targets a byte budget
  *     per task (decode cost follows bytes, not rows — row-count
  *     partitioning would skew on mixed media);
  *   - frame sampling is a generator (`explode` of a computed range),
  *     emitting (media_id, frame_idx, frame_ts_ms) rows.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])
  final case class ImageMeta(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      size_bytes: Long,
      sha256: String)

  /** Deterministic synthetic media table derived from a numeric id
    * column — bytes are sha256-chained blocks (pure expressions, no
    * driver randomness). Sizes vary by kind to exercise byte-budget
    * partitioning.
    */
  def synthMedia(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    val base = spark.range(0L, n, 1L, partitions)
      .withColumn("kind", element_at(kinds, pmod(col("id"), lit(3L)).cast("int") + 1))
    // 32–128 deterministic bytes per row: concat of sha256 blocks.
    val nBlocks = (pmod(xxhash64(col("id")), lit(4L)) + 1).cast("int")
    val blocks = transform(sequence(lit(1), nBlocks), i =>
      unhex(sha2(concat(col("id").cast("string"), lit(":"), i.cast("string")), 256)))
    base.select(
      col("id").as("media_id"),
      col("kind"),
      aggregate(blocks, lit(Array.emptyByteArray), (acc, b) => concat(acc, b)).as("bytes"))
  }

  /** STUB decode — fake header parse: width/height/channels derived from
    * the first bytes. Replace the body marked below with a real codec
    * call (e.g. javax.imageio / ffmpeg bindings) in production; the
    * Dataset/mapPartitions contract stays identical.
    */
  def decodeImageMeta(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("bytes"))
      .as[MediaRecord]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { r =>
          // --- STUB decode body (deterministic fake; no codec libs) ---
          val b0 = if (r.bytes.nonEmpty) r.bytes(0) & 0x7f else 0
          val b1 = if (r.bytes.length > 1) r.bytes(1) & 0x7f else 0
          val width = 16 + b0 * 8
          val height = 16 + b1 * 8
          val channels = if (r.kind == "image") 3 else 1
          // --- end stub ---
          md.reset()
          val sha = md.digest(r.bytes).map("%02x".format(_)).mkString
          ImageMeta(r.media_id, width, height, channels, r.bytes.length.toLong, sha)
        }
      }
  }

  /** STUB frame sampler: emits `n_frames` (deterministic fake:
    * `media_id % 8 + 1` — plain modular arithmetic so the DuckDB oracle
    * replays the whole generator, not just the timestamp math) rows per
    * video at `everyMs` spacing. Pure generator — explode of a computed
    * sequence, no state. A real decoder replaces only the `nFrames`
    * derivation (duration / everyMs); the generator shape is the
    * load-bearing part.
    */
  def sampleFrames(media: DataFrame, everyMs: Int = 40): DataFrame = {
    val nFrames = (pmod(col("media_id"), lit(8L)) + 1).cast("int")
    media
      .where(col("kind") === "video")
      .select(col("media_id"),
        posexplode(sequence(lit(0), nFrames - 1)))
      .select(
        col("media_id"),
        col("pos").as("frame_idx"),
        (col("pos") * everyMs).as("frame_ts_ms"))
  }

  /** Total input bytes WITHOUT a full pass over the `bytes` column (at
    * 100 TB that pre-scan would cost as much as the decode itself):
    * file-backed frames use the scan's file-listing metadata
    * (`HadoopFsRelation.location.sizeInBytes` — file sizes are ~the
    * bytes column for a media table, and listing is metadata-only);
    * computed/non-file frames fall back to avg-of-first-`sampleRows`
    * × a metadata-cheap row count.
    */
  def estimateTotalBytes(
      media: DataFrame,
      bytesCol: String = "bytes",
      sampleRows: Int = 1024): Long = {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // File-listing metadata is only an honest estimate when the frame IS
    // the table (bare scan, possibly column-pruned): a filtered frame or
    // a join would mis-size by the whole table's bytes. Anything
    // non-trivial takes the sample path, which sees the actual frame.
    val plan = media.queryExecution.optimizedPlan
    val bareScan = plan.collect {
      case p => p
    }.forall {
      case _: Project | _: LogicalRelation => true
      case _ => false
    }
    val fileSizes = plan.collectLeaves().collect {
      case l: LogicalRelation => l.relation
    }.collect { case f: HadoopFsRelation => f.location.sizeInBytes }
    if (bareScan && fileSizes.length == 1) fileSizes.sum
    else {
      // Sample path: only `sampleRows` rows ever evaluate the bytes
      // column; count() itself prunes it.
      val avgLen = media
        .select(length(col(bytesCol)).cast("double").as("__len"))
        .limit(sampleRows)
        .agg(avg(col("__len")))
        .head()
      val a = if (avgLen.isNullAt(0)) 0d else avgLen.getDouble(0)
      math.ceil(a * media.count()).toLong
    }
  }

  /** Byte-budget repartitioning: decode tasks should be sized by input
    * BYTES, not row count (decode cost follows bytes; row-count
    * partitioning skews on mixed media). Hash on media_id; the
    * partition COUNT comes from estimated total bytes / budget — no
    * extra job over the `bytes` column for file-backed tables.
    */
  def repartitionForDecode(media: DataFrame, bytesPerTask: Long): DataFrame = {
    val totalBytes = estimateTotalBytes(media)
    val parts = math.max(1, math.ceil(totalBytes.toDouble / bytesPerTask).toInt)
    media.repartition(parts, col("media_id"))
  }

  /** Metadata summary per kind — the prunable-metadata path: touches
    * only computed meta columns, never re-reads `bytes`.
    */
  def metaSummary(media: DataFrame): DataFrame =
    media
      .select(col("media_id"), col("kind"), length(col("bytes")).as("size_bytes"),
        sha2(col("bytes"), 256).as("sha256"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("size_bytes")).as("total_bytes"),
        min(col("size_bytes")).as("min_bytes"),
        max(col("size_bytes")).as("max_bytes"),
        countDistinct(col("sha256")).as("n_distinct"))
}
