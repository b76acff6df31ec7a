package graft.index

import graft.dedup.Dedup
import graft.refint.RefIntegrity
import graft.sim.{Ivf, Similarity}
import graft.util.CacheScope
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent build-once / query-many similarity and dedup indices.
  *
  * Every ANN / near-dup miner in [[graft.sim]] and [[graft.dedup]]
  * recomputes its signatures / buckets / centroids per call — fine for
  * one-shot jobs, wrong for the real corpus workflow where an index is
  * built once and queried many times (the reference's own pattern is
  * precompute-once-per-tick into a keyed view,
  * app/.../HomeViewModel.kt:43-47). This store writes each index as a
  * parquet table plus a one-row JSON parameter sidecar, and the load
  * path validates the stored parameters before handing the frame to
  * the `...FromIndex` / `...FromSigs` variants of the miners — so a
  * query against an index built with different hash parameters fails
  * loudly instead of silently returning garbage.
  *
  * Layout per index directory:
  *   - `data/…` — the index table (parquet; IVF assignments are
  *     `partitionBy(list)` so probing nProbe of k lists dynamic-
  *     partition-prunes the scan to ~nProbe/k of the index);
  *   - `ivf_centroids/…` — (IVF only) the k×dim centroid table;
  *   - `meta/…` — one JSON row of build parameters (kind-tagged).
  *
  * At 100 TB this is the difference between one corpus-wide
  * shingle/centroid pass per QUERY BATCH and one per INDEX REBUILD.
  *
  * CONCURRENCY: every `append…` path is SINGLE-WRITER. The row-append
  * indices read the stored ids and then append — idempotent for
  * serialized retries, but two concurrent appenders (or a batch append
  * racing the streaming `minHashIndexSink` on the same path) can both
  * pass the anti-join and land duplicate index rows; `appendBloom`'s
  * read-merge-swap can likewise lose one writer's keys. Serialize
  * writers per index path (the [[graft.resume.Checkpoint]] manifest,
  * a scheduler lock, or one owning streaming query). Concurrent
  * READERS are safe: appends never rewrite existing rows, and
  * [[loadBloom]] falls back to the complete `data.swap-old` aside
  * during `appendBloom`'s brief between-renames window.
  */
object IndexStore {

  final case class MinHashMeta(kind: String, k: Int, shingleN: Int)
  final case class LshMeta(kind: String, dim: Int, nPlanes: Int, nTables: Int, seed: Long)
  final case class IvfMeta(kind: String, dim: Int, nLists: Int, iters: Int, seed: Long)
  final case class BloomMeta(kind: String, keys: String, expectedItems: Long, fpp: Double)
  final case class DriftMeta(kind: String, valueCol: String, groupCols: String, edges: Seq[Double])
  final case class ExpectationsMeta(kind: String, groupCols: String)

  // -------------------------------------------------------------------
  // meta sidecar
  // -------------------------------------------------------------------

  private def writeMeta[T <: Product](spark: SparkSession, path: String, meta: T)(
      implicit enc: Encoder[T]): Unit =
    spark.createDataset(Seq(meta))
      .coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/meta")

  private def readMeta[T <: Product](spark: SparkSession, path: String, kind: String)(
      implicit enc: Encoder[T]): T = {
    // Kind check BEFORE the typed decode: a wrong-kind sidecar has
    // different fields, and decoding those to nulls would throw an
    // opaque codec error instead of naming the actual mismatch.
    val kinds = spark.read.json(s"$path/meta").select(col("kind")).collect()
    require(kinds.length == 1, s"index at $path has no readable meta sidecar")
    val actual = kinds.head.getString(0)
    require(actual == kind,
      s"index at $path is a '$actual' index, not '$kind'")
    spark.read.schema(enc.schema).json(s"$path/meta").as[T](enc).head()
  }

  // -------------------------------------------------------------------
  // Bloom key-membership index (referential integrity at scale)
  // -------------------------------------------------------------------

  /** Build and persist a Bloom filter over `dim`'s key tuple — the
    * build-once artifact for [[graft.refint.RefIntegrity]]'s bloom
    * paths. MB-sized regardless of dim width, so every later fact scan
    * loads it in one driver read and probes with zero shuffle.
    */
  def buildBloom(
      dim: DataFrame,
      keys: Seq[String],
      path: String,
      expectedItems: Long,
      fpp: Double = 0.01): Unit = {
    val spark = dim.sparkSession
    val bytes = RefIntegrity.buildKeyBloom(dim, keys, expectedItems, fpp)
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("bloom")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    writeMeta(spark, path,
      BloomMeta("bloom", keys.mkString(","), expectedItems, fpp))(
      Encoders.product[BloomMeta])
  }

  /** Stored filter bytes + build parameters. Callers must probe with
    * the SAME key columns in the meta's recorded order.
    *
    * Safe against a concurrent [[appendBloom]] swap: between its two
    * renames `data` is briefly absent while the complete pre-merge
    * filter sits at `data.swap-old` — a not-found read falls back to
    * the aside (and retries `data` once more for the reverse
    * interleaving) before giving up.
    */
  def loadBloom(spark: SparkSession, path: String): (Array[Byte], BloomMeta) = {
    val meta = readMeta[BloomMeta](spark, path, "bloom")(Encoders.product[BloomMeta])
    def read(sub: String): Array[org.apache.spark.sql.Row] =
      spark.read.parquet(s"$path/$sub").collect()
    // Both swap-race shapes: planning-time PATH_NOT_FOUND (dir gone
    // before resolution) AND execution-time FileNotFound (dir renamed
    // away between file listing and the task's open) — walk the cause
    // chain; anything else rethrows untouched.
    def transientMissing(e: Throwable): Boolean = {
      var t = e; var depth = 0
      while (t != null && depth < 16) {
        if (t.isInstanceOf[java.io.FileNotFoundException]) return true
        if (t.getMessage != null && t.getMessage.contains("PATH_NOT_FOUND"))
          return true
        t = t.getCause; depth += 1
      }
      false
    }
    val rows =
      try read("data")
      catch {
        case e: Exception if transientMissing(e) =>
          try read("data.swap-old")
          catch { case e2: Exception if transientMissing(e2) =>
            read("data") // swap completed meanwhile: live copy is back
          }
      }
    require(rows.length == 1, s"bloom index at $path must hold exactly one row")
    (rows.head.getAs[Array[Byte]]("bloom"), meta)
  }

  /** Incrementally fold a new dim slice into a stored Bloom index:
    * deserialize, merge the new keys' partial filter, rewrite. Bloom
    * filters absorb re-inserted keys idempotently, so ingest retries
    * are safe; the fpp guarantee holds while total distinct keys stay
    * within the stored `expectedItems` (checked nowhere — the filter
    * degrades gracefully to a higher fpp, never to false negatives).
    *
    * Crash-safe: unlike the row-append indices (whose old rows are
    * never touched), this REPLACES the only copy of the filter — so the
    * merged filter is written to a sibling temp dir and rename-swapped
    * into place (the [[graft.sources.TableIO.compact]] protocol): a
    * crash at any step leaves a complete filter under `data`,
    * `data.swap-tmp`, or `data.swap-old`, never a half-written one.
    * Both crash windows self-heal BEFORE any work runs (the crashed
    * call never committed, so its caller retries it): a leftover
    * `data.swap-old` WITHOUT a live `data` is renamed back (crash
    * between the two swap renames); one alongside a live `data` is a
    * stale aside from a crash after the swap, deleted. A leftover
    * `data.swap-tmp` is an uncommitted merge, deleted either way.
    * Single-writer, like every append path (object scaladoc).
    */
  def appendBloom(dim: DataFrame, path: String): Unit = {
    val spark = dim.sparkSession
    val live = new org.apache.hadoop.fs.Path(s"$path/data")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(live.getParent, "data.swap-tmp")
    val old = new org.apache.hadoop.fs.Path(live.getParent, "data.swap-old")
    if (fs.exists(old)) {
      if (fs.exists(live)) fs.delete(old, true) // stale aside, post-swap crash
      else require(fs.rename(old, live), // mid-swap crash: restore the filter
        s"appendBloom recovery rename $old -> $live failed")
    }
    fs.delete(tmp, true) // an uncommitted merge from a crashed writer
    val (bytes, meta) = loadBloom(spark, path)
    val keys = meta.keys.split(",").toSeq
    val bf = graft.functions.BloomExprs.deserialize(bytes)
    val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
    // Merge via a per-partition filter build + driver-side mergeInPlace:
    // ships one MB-sized filter per partition, never the key rows.
    val partial = dim.where(nonNull)
      .select(RefIntegrity.keyHash(keys).as("__kh"))
      .stat.bloomFilter("__kh", meta.expectedItems, meta.fpp)
    bf.mergeInPlace(partial)
    import spark.implicits._
    Seq(Tuple1(graft.functions.BloomExprs.serialize(bf))).toDF("bloom")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(live, old), s"appendBloom aside-rename failed for $live")
    if (!fs.rename(tmp, live)) {
      fs.rename(old, live) // restore rather than leave the index missing
      throw new IllegalStateException(s"appendBloom swap-rename failed for $live")
    }
    fs.delete(old, true)
  }

  // -------------------------------------------------------------------
  // MinHash signature index
  // -------------------------------------------------------------------

  /** Compute and persist MinHash signatures `(id, sig)` once. */
  def buildMinHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      k: Int = 64,
      shingleN: Int = 8): Unit = {
    Dedup.minHashSignatures(df, idCol, textCol, k, shingleN)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    writeMeta(df.sparkSession, path, MinHashMeta("minhash", k, shingleN))(
      Encoders.product[MinHashMeta])
  }

  /** Stored signature frame + its build parameters. */
  def loadMinHash(spark: SparkSession, path: String): (DataFrame, MinHashMeta) = {
    val meta = readMeta[MinHashMeta](spark, path, "minhash")(Encoders.product[MinHashMeta])
    (spark.read.parquet(s"$path/data"), meta)
  }

  /** Near-duplicate mining over the STORED signatures — no shingling,
    * no signature recompute; the only corpus-sized input is the index
    * scan itself.
    */
  def minHashNearDuplicates(
      spark: SparkSession,
      path: String,
      bands: Int = 16,
      minEstJaccard: Double = 0.7,
      maxBucket: Int = 1000,
      scope: CacheScope = CacheScope.shared): DataFrame = {
    val (sigs, meta) = loadMinHash(spark, path)
    Dedup.minHashNearDuplicatesFromSigs(
      sigs, meta.k, bands, minEstJaccard, maxBucket, scope)
  }

  /** Incrementally extend a stored MinHash index with the rows of `df`
    * whose id is NOT yet indexed (anti-join against the stored ids —
    * re-appending an already-indexed batch is a no-op, so ingest
    * retries are idempotent at the row level). Signatures are computed
    * with the INDEX's stored (k, shingleN) — the caller cannot drift
    * the parameters. Returns the number of rows appended.
    *
    * This is the daily-ingest path at corpus scale: one signature pass
    * over the NEW slice only, never a corpus rebuild. The parquet
    * append itself is not atomic (crash mid-append can leave a partial
    * batch visible); wrap calls in the [[graft.resume.Checkpoint]]
    * manifest protocol when exactly-once batch visibility matters.
    */
  def appendMinHash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Long = {
    val spark = df.sparkSession
    val (stored, meta) = loadMinHash(spark, path)
    val fresh = df.join(
        stored.select(col("id").as(idCol)), Seq(idCol), "left_anti")
    val sigs = Dedup.minHashSignatures(fresh, idCol, textCol, meta.k, meta.shingleN)
    appendCounted(sigs, s"$path/data")
  }

  /** Write `rows` via append and report how many landed — the count
    * runs BEFORE the write (on a cached frame) so the data is read
    * once, not twice.
    */
  private def appendCounted(rows: DataFrame, dataPath: String,
      partitionCols: Seq[String] = Nil): Long = {
    rows.persist()
    try {
      val n = rows.count()
      if (n > 0) {
        val w = rows.write.mode(SaveMode.Append)
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
          .parquet(dataPath)
      }
      n
    } finally rows.unpersist()
  }

  // -------------------------------------------------------------------
  // Random-hyperplane LSH bucket index (embeddings)
  // -------------------------------------------------------------------

  /** Compute and persist the corpus bucket index
    * `(id, vec, table, bucket, c_norm)` once.
    */
  def buildLsh(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      dim: Int,
      nPlanes: Int = 12,
      nTables: Int = 4,
      seed: Long = 42L): Unit = {
    Similarity.lshIndex(corpus, idCol, vecCol, dim, nPlanes, nTables, seed)
      .withColumn("c_norm", Similarity.norm(col("vec")))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    writeMeta(corpus.sparkSession, path,
      LshMeta("lsh", dim, nPlanes, nTables, seed))(Encoders.product[LshMeta])
  }

  def loadLsh(spark: SparkSession, path: String): (DataFrame, LshMeta) = {
    val meta = readMeta[LshMeta](spark, path, "lsh")(Encoders.product[LshMeta])
    (spark.read.parquet(s"$path/data"), meta)
  }

  /** ANN top-k against the STORED bucket index: only the query batch is
    * hashed at query time (with the index's own stored seed/planes —
    * mismatched parameters are impossible by construction).
    */
  def annTopK(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val (cIdx, meta) = loadLsh(spark, path)
    Similarity.annTopKFromIndex(cIdx, queries, idCol, vecCol,
      meta.dim, k, meta.nPlanes, meta.nTables, meta.seed)
  }

  /** Incrementally extend a stored LSH bucket index with not-yet-
    * indexed vectors, hashed with the INDEX's stored planes/seed (same
    * idempotent anti-join contract as [[appendMinHash]]). Returns the
    * number of corpus rows appended (each contributes nTables bucket
    * rows).
    */
  def appendLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): Long = {
    val spark = df.sparkSession
    val (stored, meta) = loadLsh(spark, path)
    val fresh = df.join(
      stored.select(col("id").as(idCol)).distinct(), Seq(idCol), "left_anti")
    val rows = Similarity
      .lshIndex(fresh, idCol, vecCol, meta.dim, meta.nPlanes, meta.nTables, meta.seed)
      .withColumn("c_norm", Similarity.norm(col("vec")))
    appendCounted(rows, s"$path/data") / math.max(meta.nTables, 1)
  }

  // -------------------------------------------------------------------
  // IVF centroid + assignment index (embeddings)
  // -------------------------------------------------------------------

  /** Train centroids once and persist both the centroid table and the
    * per-vector list assignments (`partitionBy(list)` — probe-time
    * dynamic partition pruning).
    */
  def buildIvf(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      dim: Int,
      nLists: Int = 16,
      iters: Int = 5,
      seed: Long = 42L,
      scope: CacheScope = CacheScope.shared): Unit = {
    val spark = corpus.sparkSession
    val centroids = Ivf.trainCentroids(corpus, idCol, vecCol, dim, nLists, iters, seed, scope)
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/ivf_centroids")
    Ivf.ivfIndex(corpus, idCol, vecCol, dim, centroids)
      .withColumn("c_norm", Similarity.norm(col("vec")))
      .write.mode(SaveMode.Overwrite).partitionBy("list").parquet(s"$path/data")
    writeMeta(spark, path, IvfMeta("ivf", dim, nLists, iters, seed))(
      Encoders.product[IvfMeta])
  }

  /** Stored (centroids, assignments, meta). The centroid collect is
    * O(nLists × dim) — driver-tiny by design.
    */
  def loadIvf(spark: SparkSession, path: String): (Array[Array[Double]], DataFrame, IvfMeta) = {
    val meta = readMeta[IvfMeta](spark, path, "ivf")(Encoders.product[IvfMeta])
    val centroids = spark.read.parquet(s"$path/ivf_centroids")
      .orderBy(col("list"))
      .collect()
      .map(r => r.getSeq[Double](1).toArray)
    (centroids, spark.read.parquet(s"$path/data"), meta)
  }

  /** Incrementally extend a stored IVF index: assign only the
    * not-yet-indexed vectors to their nearest EXISTING centroid and
    * append into the list-partitioned assignment table. Centroids are
    * deliberately left untouched — that is how production IVF indices
    * ingest (appends between rebuilds; retraining centroids would
    * silently invalidate every stored assignment). Returns rows
    * appended.
    */
  def appendIvf(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): Long = {
    val spark = df.sparkSession
    val (centroids, assignments, meta) = loadIvf(spark, path)
    val fresh = df.join(
      assignments.select(col("id").as(idCol)), Seq(idCol), "left_anti")
    val rows = Ivf.ivfIndex(fresh, idCol, vecCol, meta.dim, centroids)
      .withColumn("c_norm", Similarity.norm(col("vec")))
    appendCounted(rows, s"$path/data", partitionCols = Seq("list"))
  }

  /** ANN top-k against the STORED IVF index — no re-training, no
    * re-assignment; queries probe their `nProbe` nearest stored lists.
    */
  def ivfTopK(
      spark: SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int): DataFrame = {
    val (centroids, assignments, meta) = loadIvf(spark, path)
    Ivf.ivfTopKFromIndex(centroids, assignments, queries, idCol, vecCol,
      meta.dim, k, nProbe)
  }

  // -------------------------------------------------------------------
  // Drift baseline sketch (north rule: "KS/PSI against a baseline
  // sketch" — the sketch is a persisted artifact, not a per-run rescan)
  // -------------------------------------------------------------------

  /** Derive auto-binning edges from the baseline's quantiles, bin it
    * once, and persist sketch + edges. Every later snapshot scores
    * against O(groups × bins) stored rows — the baseline corpus is
    * never rescanned (at 100 TB the baseline scan IS the cost).
    */
  def buildDriftBaseline(
      base: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      path: String,
      nBins: Int = 10,
      exact: Boolean = false): Unit = {
    val edges = graft.drift.Drift.quantileEdges(base, valueCol, nBins, exact)
    graft.drift.Drift.binsByEdges(base, valueCol, groupCols, edges)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/data")
    writeMeta(base.sparkSession, path,
      DriftMeta("drift", valueCol, groupCols.mkString(","), edges.toSeq))(
      Encoders.product[DriftMeta])
  }

  /** Stored sketch frame + build parameters (incl. the exact edges).
    * Counts are re-summed per (group, bin) on load: appends write each
    * slice's bins as extra rows (see [[appendDriftBaseline]]), and the
    * aggregation is O(stored rows) — bins × groups × slices, tiny.
    */
  def loadDriftBaseline(spark: SparkSession, path: String): (DataFrame, DriftMeta) = {
    val meta = readMeta[DriftMeta](spark, path, "drift")(Encoders.product[DriftMeta])
    val groupCols = meta.groupCols.split(",").toSeq.filter(_.nonEmpty)
    val sketchDf = spark.read.parquet(s"$path/data")
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("n")).as("n"))
    (sketchDf, meta)
  }

  /** PSI/KS of `cur` against the STORED baseline: bins `cur` by the
    * persisted edges and joins the O(groups × bins) sketch — one scan
    * of the new data, zero scans of the baseline.
    */
  def driftAgainstBaseline(
      cur: DataFrame,
      path: String,
      eps: Double = 1e-6): DataFrame = {
    val (sketchDf, meta) = loadDriftBaseline(cur.sparkSession, path)
    val groupCols = meta.groupCols.split(",").toSeq.filter(_.nonEmpty)
    graft.drift.Drift.compareWithBaselineEdges(
      cur, sketchDf, meta.valueCol, groupCols, meta.edges.toArray, eps)
  }

  /** Fold a new baseline slice into the stored sketch: bin by the
    * STORED edges (binning never changes after build — comparability
    * beats re-quantiling) and APPEND the slice's bin rows; the load
    * path re-sums per (group, bin). Append-only, so a crashed append
    * never corrupts the existing sketch.
    */
  def appendDriftBaseline(slice: DataFrame, path: String): Long = {
    val meta = readMeta[DriftMeta](slice.sparkSession, path, "drift")(
      Encoders.product[DriftMeta])
    val groupCols = meta.groupCols.split(",").toSeq.filter(_.nonEmpty)
    appendCounted(
      graft.drift.Drift.binsByEdges(
        slice, meta.valueCol, groupCols, meta.edges.toArray),
      s"$path/data")
  }

  // -------------------------------------------------------------------
  // Expectation-observation snapshots (baseline-relative gates:
  // "a snapshot 40% smaller than YESTERDAY'S" needs yesterday's
  // observations persisted — no static bound can express it)
  // -------------------------------------------------------------------

  /** Atomically replace a SMALL text artifact (a SchemaJson document,
    * an ExpectJson suite) at `path`: stale tmp/aside copies are cleared,
    * the new text lands at `<path>.tmp`, the live file is swapped aside,
    * tmp renamed into place, the aside copy dropped — the same rename
    * discipline as [[appendBloom]]. Crash windows self-heal: [[loadText]]
    * falls back to the aside copy while live is briefly absent, and the
    * next save clears whatever a crash stranded. Single-writer, like
    * every other mutation in this store.
    */
  def saveText(spark: SparkSession, path: String, text: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val aside = new org.apache.hadoop.fs.Path(path + ".swap-old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // create(overwrite) clears any stranded tmp; the aside copy is NOT
    // cleared up front — after a crash between the two renames it is
    // the ONLY surviving copy, and deleting it before the new live is
    // published would turn a second crash into total artifact loss.
    val out = fs.create(tmp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(live)) {
      fs.delete(aside, false) // stale aside is superseded by live
      require(fs.rename(live, aside), s"saveText: could not swap aside $live")
    }
    require(fs.rename(tmp, live), s"saveText: could not publish $tmp -> $live")
    fs.delete(aside, false)
    ()
  }

  /** Read a [[saveText]] artifact; None when never written. Tolerates a
    * CONCURRENT swap: each probe treats a file vanishing between
    * exists() and open() as absent (the TOCTOU window is real — the
    * writer renames between those calls), falls back to the aside copy,
    * and retries live once for the complementary race (reader saw live
    * absent mid-swap; writer then published and dropped the aside).
    */
  def loadText(spark: SparkSession, path: String): Option[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    def read(p: org.apache.hadoop.fs.Path): Option[String] = {
      val fs = p.getFileSystem(conf)
      try {
        // read the OPENED stream to EOF — a stat-then-read by length
        // would have its own TOCTOU (stat the old file, open the new
        // one, hand back a silently truncated artifact)
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } catch {
        case _: java.io.FileNotFoundException => None
      }
    }
    val live = new org.apache.hadoop.fs.Path(path)
    val aside = new org.apache.hadoop.fs.Path(path + ".swap-old")
    read(live).orElse(read(aside)).orElse(read(live))
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Persist one snapshot's [[graft.verdict.Expectations.evaluate]]
    * output, tagged `(snapshot_id, seq)`; `seq` is max(stored)+1 so
    * the LATEST snapshot is well-defined without a wall clock.
    * History stacks per snapshotId; RE-writing an EXISTING snapshotId
    * dynamic-overwrites only that snapshot's partition (content-
    * idempotent retries/replays — a crashed half-written snapshot is
    * fully rewritten, never duplicated; its seq advances, keeping a
    * replayed latest batch latest). O(groups × checks) rows per
    * snapshot. Single-writer, like every append path (object
    * scaladoc). Returns rows written.
    */
  def appendExpectationSnapshot(
      df: DataFrame,
      expects: Seq[graft.verdict.Expectations.Expect],
      groupCols: Seq[String],
      path: String,
      snapshotId: String,
      approxDistinct: Boolean = false): Long = {
    val spark = df.sparkSession
    // Partition-path-safe ids only: the snapshot lands (and is pruned)
    // as the literal directory `snapshot_id=<id>` — path-escaping
    // characters would silently desynchronize write and prune paths.
    require(snapshotId.nonEmpty && snapshotId.matches("[A-Za-z0-9._-]+"),
      s"snapshotId '$snapshotId' must match [A-Za-z0-9._-]+ " +
        "(it names a partition directory)")
    val enc = Encoders.product[ExpectationsMeta]
    val seq =
      if (!exists(spark, s"$path/meta")) {
        writeMeta(spark, path,
          ExpectationsMeta("expectations", groupCols.mkString(",")))(enc)
        0L
      } else {
        val meta = readMeta[ExpectationsMeta](spark, path, "expectations")(enc)
        require(meta.groupCols == groupCols.mkString(","),
          s"expectation store at $path was built with groupCols=" +
            s"'${meta.groupCols}', not '${groupCols.mkString(",")}'")
        // Meta existing with NO data is a crashed-before-data or
        // zero-row first append — NOT a poisoned store: restart at 0.
        if (!exists(spark, s"$path/data")) 0L
        else {
          val m = spark.read.parquet(s"$path/data").agg(max(col("seq"))).head()
          if (m.isNullAt(0)) 0L else m.getLong(0) + 1L
        }
      }
    val rows = graft.verdict.Expectations
      .evaluate(df, expects, groupCols, approxDistinct)
      .withColumn("seq", lit(seq))
      .withColumn("snapshot_id", lit(snapshotId))
    rows.persist()
    try {
      val n = rows.count()
      if (n > 0)
        rows.write
          .mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("snapshot_id")
          .parquet(s"$path/data")
      n
    } finally rows.unpersist()
  }

  /** The LATEST stored snapshot's observation rows (max `seq`) + meta.
    * `excludeSnapshotId` masks one snapshot from the search — a
    * streaming replay gates a batch against its PREDECESSOR even when
    * the batch's own snapshot already landed before the crash; with
    * nothing left after the mask the frame is empty (first-run
    * semantics).
    */
  def loadLatestExpectations(
      spark: SparkSession,
      path: String,
      excludeSnapshotId: String = null): (DataFrame, ExpectationsMeta) = {
    val meta = readMeta[ExpectationsMeta](spark, path, "expectations")(
      Encoders.product[ExpectationsMeta])
    require(exists(spark, s"$path/data"),
      s"expectation store at $path has a meta sidecar but no data " +
        "(crashed or zero-row first append) — gate via " +
        "expectationsAgainstBaseline, which treats this as a first run")
    val all0 = spark.read.parquet(s"$path/data")
    val all =
      if (excludeSnapshotId == null) all0
      else all0.where(col("snapshot_id") =!= excludeSnapshotId)
    val latest = all.agg(max(col("seq"))).head()
    val snap =
      if (latest.isNullAt(0)) all.limit(0)
      else all.where(col("seq") === latest.getLong(0))
    (snap, meta)
  }

  /** Bound the snapshot HISTORY: delete all but the `keepLast`
    * highest-seq snapshots (whole `snapshot_id=<id>` partition
    * directories — ids are path-safe by construction, enforced at
    * append). Without pruning, a per-batch streaming writer accumulates
    * history forever and every max(seq) discovery scans all of it —
    * O(batches²) cumulative. Single-writer, like the appends; run it
    * from the one owning writer (the streaming sink does, per batch).
    * Returns snapshots deleted.
    */
  def pruneExpectationSnapshots(
      spark: SparkSession,
      path: String,
      keepLast: Int): Long = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    if (!exists(spark, s"$path/data")) return 0L
    val pairs = spark.read.parquet(s"$path/data")
      .select(col("snapshot_id"), col("seq")).distinct().collect()
    val drop = pairs.sortBy(-_.getLong(1)).drop(keepLast)
    if (drop.isEmpty) return 0L
    val root = new org.apache.hadoop.fs.Path(s"$path/data")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop.foreach { r =>
      fs.delete(new org.apache.hadoop.fs.Path(root,
        s"snapshot_id=${r.getString(0)}"), true)
    }
    drop.length.toLong
  }

  /** Relative expectation gates of `cur` against the LATEST stored
    * snapshot ([[graft.verdict.Expectations.evaluateRelative]]).
    * FIRST RUN (no store at `path` yet): evaluated against an EMPTY
    * baseline, so every bounded relative check FAILS — "no history"
    * must not pass a gate that asked for a comparison (the same
    * no-signal rule as an all-null mean). Bootstrap by storing the
    * first snapshot via [[appendExpectationSnapshot]] and gating from
    * the second run on.
    */
  def expectationsAgainstBaseline(
      cur: DataFrame,
      expects: Seq[graft.verdict.Expectations.Expect],
      groupCols: Seq[String],
      path: String,
      approxDistinct: Boolean = false,
      excludeSnapshotId: String = null): DataFrame = {
    val spark = cur.sparkSession
    val baseline =
      // No store, or a meta sidecar without data (crashed/zero-row
      // first append): both are "no history" — first-run FAIL path.
      if (!exists(spark, s"$path/meta") || !exists(spark, s"$path/data"))
        // Typed empty frame (group columns borrowed from `cur` so join
        // key types line up).
        cur.select(groupCols.map(col): _*)
          .withColumn("check", lit(""))
          .withColumn("column", lit(""))
          .withColumn("observed", lit(0d))
          .limit(0)
      else {
        val (snap, meta) =
          loadLatestExpectations(spark, path, excludeSnapshotId)
        require(meta.groupCols == groupCols.mkString(","),
          s"expectation store at $path was built with groupCols=" +
            s"'${meta.groupCols}', not '${groupCols.mkString(",")}'")
        snap
      }
    graft.verdict.Expectations.evaluateRelative(
      cur, expects, baseline, groupCols, approxDistinct)
  }
}
