package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synthMedia(spark, 300L, partitions = 8).cache()

  test("synth media: deterministic bytes, kinds cycle, sizes are sha-block multiples") {
    val a = media.select($"media_id", sha2($"bytes", 256).as("h")).as[(Long, String)].collect().toMap
    val b = Multimodal.synthMedia(spark, 300L, partitions = 3)
      .select($"media_id", sha2($"bytes", 256).as("h")).as[(Long, String)].collect().toMap
    assert(a === b) // identical at different parallelism
    val sizes = media.select(length($"bytes")).as[Int].collect()
    assert(sizes.forall(s => s % 32 === 0 && s >= 32 && s <= 128))
    val kinds = media.select($"kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("decodeImageMeta: typed stub decode over mapPartitions, schema + determinism") {
    val meta = Multimodal.decodeImageMeta(media)
    assert(meta.columns.toSeq ===
      Seq("media_id", "width", "height", "channels", "size_bytes", "sha256"))
    val rows = meta.collect()
    assert(rows.length === 300)
    rows.foreach { m =>
      assert(m.width >= 16 && m.width <= 16 + 127 * 8)
      assert(m.height >= 16)
      assert(m.channels === (if (m.media_id % 3 == 0) 3 else 1)) // kind cycles image,audio,video
      assert(m.sha256.length === 64)
    }
    // sha256 computed in the stub matches the expression-side digest
    val exprSha = media.select($"media_id", sha2($"bytes", 256).as("s")).as[(Long, String)].collect().toMap
    rows.foreach(m => assert(m.sha256 === exprSha(m.media_id)))
  }

  test("frame sampling: generator rows only for videos, spaced timestamps") {
    val frames = Multimodal.sampleFrames(media, everyMs = 40)
    val byId = frames.collect().groupBy(_.getAs[Long]("media_id"))
    assert(byId.keySet.forall(_ % 3 == 2)) // only kind=video ids
    byId.values.foreach { fs =>
      val idx = fs.map(_.getAs[Int]("frame_idx")).sorted
      assert(idx.toSeq === (0 until fs.length))
      fs.foreach(f => assert(f.getAs[Int]("frame_ts_ms") === f.getAs[Int]("frame_idx") * 40))
    }
    assert(byId.values.map(_.length).max <= 8)
  }

  test("byte-budget repartitioning sizes partitions by bytes, not rows") {
    val total = media.agg(sum(length($"bytes"))).head().getLong(0)
    // Computed (non-file) frame → sample-based estimate; 300 rows all
    // fall inside the sample window so the estimate is ~exact.
    val est = Multimodal.estimateTotalBytes(media)
    assert(math.abs(est - total) <= total / 100)
    val repart = Multimodal.repartitionForDecode(media, bytesPerTask = 2048L)
    val expected = math.ceil(est.toDouble / 2048L).toInt
    assert(repart.rdd.getNumPartitions === expected)
    assert(expected > media.rdd.getNumPartitions / 4) // bytes, not rows, drive it
  }

  test("file-backed media estimates bytes from file metadata, not a bytes scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val est = Multimodal.estimateTotalBytes(onDisk)
    // File-listing total: ≥ the raw (incompressible sha-derived) bytes
    // column, plus bounded parquet framing overhead.
    val raw = media.agg(sum(length($"bytes"))).head().getLong(0)
    assert(est >= raw)
    assert(est <= raw * 4 + (1L << 20))
    // Metadata path: the estimate must not launch any Spark job.
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Multimodal.estimateTotalBytes(onDisk)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after === before)

    // A FILTERED file-backed frame must NOT use whole-table file sizes —
    // it falls to the sampling path and sees only the filtered bytes.
    val filtered = onDisk.where($"kind" === "image")
    val filteredRaw = filtered.agg(sum(length($"bytes"))).head().getLong(0)
    val filteredEst = Multimodal.estimateTotalBytes(filtered)
    assert(filteredEst <= filteredRaw + filteredRaw / 10)
    assert(filteredEst < est) // strictly below the whole-table estimate
  }

  test("meta summary aggregates without re-reading bytes downstream") {
    val s = Multimodal.metaSummary(media).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("n_media")).toMap
    assert(s.values.sum === 300L)
    assert(s.keySet === Set("image", "audio", "video"))
  }
}
