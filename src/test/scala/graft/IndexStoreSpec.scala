package graft

import graft.dedup.Dedup
import graft.functions.{CentroidTopLists, MinHashSig}
import graft.index.IndexStore
import graft.sim.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Build-once/query-many index persistence: stored indices reproduce
  * the direct-compute results exactly, and the query-time plan reads
  * the index parquet instead of recomputing signatures / buckets /
  * centroids.
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-idx-$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** All expressions of the optimized plan matching a predicate. */
  private def exprCount(df: DataFrame, p: Expression => Boolean): Int =
    df.queryExecution.optimizedPlan.collect { case node =>
      node.expressions.map(_.collect { case e if p(e) => e }.size).sum
    }.sum

  test("minhash: stored signatures reproduce direct mining, no signature recompute") {
    val path = tmpDir("minhash")
    IndexStore.buildMinHash(docs, "doc_id", "text", path, k = 64, shingleN = 8)

    val direct = Dedup.minHashNearDuplicates(docs, "doc_id", "text",
        k = 64, bands = 16, shingleN = 8, minEstJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    graft.util.CacheScope.shared.release()

    // query twice from the same stored index
    (1 to 2).foreach { _ =>
      val fromIndex = IndexStore.minHashNearDuplicates(spark, path,
        bands = 16, minEstJaccard = 0.5)
      assert(fromIndex.as[(Long, Long, Double)].collect().toSet === direct)
      // the plan computes NO minhash signatures — the index scan is the input
      assert(exprCount(fromIndex, _.isInstanceOf[MinHashSig]) === 0)
      assert(fromIndex.inputFiles.forall(_.contains(path)),
        "index query reads files outside the stored index")
      graft.util.CacheScope.shared.release()
    }
  }

  test("lsh: stored bucket index reproduces direct annTopK; only the query side hashes") {
    val path = tmpDir("lsh")
    IndexStore.buildLsh(emb, "vec_id", "embedding", path,
      dim = 64, nPlanes = 4, nTables = 8)

    val queries = emb.where($"vec_id" < 10)
    val direct = Similarity.annTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 5, nPlanes = 4, nTables = 8)
      .select($"q_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet

    val fromIndex = IndexStore.annTopK(spark, path, queries, "vec_id", "embedding", k = 5)
    assert(fromIndex.select($"q_id", $"vec_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet === direct)
    // direct plan buckets BOTH sides; the index plan only the query side
    assert(exprCount(direct2frame(queries), _.isInstanceOf[graft.functions.HyperplaneBuckets]) === 2)
    assert(exprCount(fromIndex, _.isInstanceOf[graft.functions.HyperplaneBuckets]) === 1)
  }

  private def direct2frame(queries: DataFrame): DataFrame =
    Similarity.annTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5, nPlanes = 4, nTables = 8)

  test("ivf: stored centroids+assignments, probe-all equals brute force exactly") {
    val path = tmpDir("ivf")
    IndexStore.buildIvf(emb, "vec_id", "embedding", path,
      dim = 64, nLists = 8, iters = 2)
    graft.util.CacheScope.shared.release()

    val queries = emb.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select($"q_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val fromIndex = IndexStore.ivfTopK(spark, path, queries, "vec_id", "embedding",
      k = 5, nProbe = 8)
    assert(fromIndex.select($"q_id", $"vec_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet === exact)
    // centroid ranking runs once (query probing); assignments come from parquet
    assert(exprCount(fromIndex, _.isInstanceOf[CentroidTopLists]) === 1)

    // stored assignment table is hive-partitioned by list (pruning seam)
    val (_, assignments, meta) = IndexStore.loadIvf(spark, path)
    assert(meta.nLists === 8 && meta.dim === 64)
    assert(assignments.inputFiles.forall(_.contains("list=")),
      "assignments are not partitioned by list")
  }

  test("minhash append: build-half + append-half == build-full; re-append is a no-op") {
    val half = tmpDir("mh-append")
    val full = tmpDir("mh-full")
    IndexStore.buildMinHash(docs.where($"doc_id" % 2 === 0), "doc_id", "text",
      half, k = 64, shingleN = 8)
    IndexStore.buildMinHash(docs, "doc_id", "text", full, k = 64, shingleN = 8)

    val oddCount = docs.where($"doc_id" % 2 === 1 && $"text".isNotNull).count()
    assert(IndexStore.appendMinHash(docs, "doc_id", "text", half) === oddCount)
    // idempotent: every id is already indexed now
    assert(IndexStore.appendMinHash(docs, "doc_id", "text", half) === 0L)

    val a = IndexStore.loadMinHash(spark, half)._1
      .select($"id", $"sig").as[(Long, Seq[Long])].collect().toSet
    val b = IndexStore.loadMinHash(spark, full)._1
      .select($"id", $"sig").as[(Long, Seq[Long])].collect().toSet
    assert(a === b)
  }

  test("ivf append: assigns new vectors to EXISTING centroids; probe-all stays exact") {
    val path = tmpDir("ivf-append")
    IndexStore.buildIvf(emb.where($"vec_id" % 2 === 0), "vec_id", "embedding",
      path, dim = 64, nLists = 8, iters = 2)
    graft.util.CacheScope.shared.release()
    val centroidsBefore = IndexStore.loadIvf(spark, path)._1.map(_.toSeq)

    val appended = IndexStore.appendIvf(emb, "vec_id", "embedding", path)
    assert(appended === emb.where($"vec_id" % 2 === 1).count())
    assert(IndexStore.appendIvf(emb, "vec_id", "embedding", path) === 0L)
    // centroids untouched by append
    assert(IndexStore.loadIvf(spark, path)._1.map(_.toSeq).toSeq === centroidsBefore.toSeq)

    // the appended index over the full corpus is still exact at probe-all
    val queries = emb.where($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select($"q_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val got = IndexStore.ivfTopK(spark, path, queries, "vec_id", "embedding",
        k = 5, nProbe = 8)
      .select($"q_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(got === exact)
  }

  test("lsh append: appended index reproduces the full-built index") {
    val half = tmpDir("lsh-append")
    val full = tmpDir("lsh-full")
    IndexStore.buildLsh(emb.where($"vec_id" % 2 === 0), "vec_id", "embedding",
      half, dim = 64, nPlanes = 4, nTables = 8)
    IndexStore.buildLsh(emb, "vec_id", "embedding", full,
      dim = 64, nPlanes = 4, nTables = 8)
    assert(IndexStore.appendLsh(emb, "vec_id", "embedding", half) ===
      emb.where($"vec_id" % 2 === 1).count())
    assert(IndexStore.appendLsh(emb, "vec_id", "embedding", half) === 0L)
    val key = (p: String) => IndexStore.loadLsh(spark, p)._1
      .select($"id", $"table", $"bucket").as[(Long, Int, Long)].collect().toSet
    assert(key(half) === key(full))
  }

  test("bloom: stored filter probes like a fresh build; append folds a new dim slice in") {
    import graft.data.SynthGen
    import graft.refint.RefIntegrity
    val files = SynthGen.codeFiles(spark, SynthGen.Config(rows = 6000L))
    val dim = SynthGen.dimCommits(spark, SynthGen.Config(rows = 6000L))
    val keys = Seq("repo", "commit")
    val path = tmpDir("bloom")

    // Build over HALF the dim, then append the full dim (idempotent
    // re-inserts): the stored filter must now cover every dim key.
    IndexStore.buildBloom(dim.where(xxhash64(col("repo"), col("commit")) % 2 === 0),
      keys, path, expectedItems = 10000L, fpp = 0.01)
    IndexStore.appendBloom(dim, path)

    val (bytes, meta) = IndexStore.loadBloom(spark, path)
    assert(meta.keys === "repo,commit" && meta.fpp === 0.01)
    val plain = RefIntegrity.orphans(files, dim, keys)
    val fast = RefIntegrity.orphansWithBloom(files, dim, keys, bytes)
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty)
    // and the approximate path still never invents an orphan
    assert(RefIntegrity.orphansApprox(files, keys, bytes)
      .exceptAll(plain).isEmpty)
  }

  test("kind mismatch fails loudly at load") {
    val path = tmpDir("kind")
    IndexStore.buildMinHash(docs, "doc_id", "text", path)
    val e = intercept[IllegalArgumentException] {
      IndexStore.loadLsh(spark, path)
    }
    assert(e.getMessage.contains("'minhash'"))
  }

  test("drift baseline: stored sketch scores == direct compare; baseline never rescanned") {
    val path = tmpDir("drift")
    val base = docs.where(col("doc_id") % 2 === 0)
    val cur = docs.where(col("doc_id") % 2 === 1)
    IndexStore.buildDriftBaseline(base, "n_chars", Seq("lang"), path,
      nBins = 8, exact = true)

    val (_, meta) = IndexStore.loadDriftBaseline(spark, path)
    assert(meta.valueCol === "n_chars" && meta.edges.length === 7)
    val stored = IndexStore.driftAgainstBaseline(cur, path)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    val direct = graft.drift.Drift.compareWithEdges(cur, base, "n_chars",
        Seq("lang"), meta.edges.toArray)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(stored === direct && stored.nonEmpty)
  }

  test("drift baseline append: build-half + append-half == build-full (same edges)") {
    val parts = tmpDir("drift-p")
    val a = docs.where(col("doc_id") % 3 === 0)
    val b = docs.where(col("doc_id") % 3 =!= 0)
    val cur = docs.where(col("doc_id") % 5 === 0)

    IndexStore.buildDriftBaseline(a, "n_chars", Seq("lang"), parts,
      nBins = 6, exact = true)
    val n = IndexStore.appendDriftBaseline(b, parts)
    assert(n > 0)
    // Whole-build sketch with the SAME edges (append keeps build edges,
    // so force them by sketching a union against the stored edges).
    val (_, meta) = IndexStore.loadDriftBaseline(spark, parts)
    val storedScores = IndexStore.driftAgainstBaseline(cur, parts)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    val directScores = graft.drift.Drift.compareWithBaselineEdges(cur,
        graft.drift.Drift.binsByEdges(a.unionByName(b), "n_chars",
          Seq("lang"), meta.edges.toArray),
        "n_chars", Seq("lang"), meta.edges.toArray)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(storedScores === directScores && storedScores.nonEmpty)
  }

  test("saveText/loadText: swap replaces atomically and both crash windows self-heal") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text").toString
    val p = s"$dir/artifact.json"
    assert(IndexStore.loadText(spark, p) === None)
    IndexStore.saveText(spark, p, "v1")
    assert(IndexStore.loadText(spark, p) === Some("v1"))
    IndexStore.saveText(spark, p, "v2")
    assert(IndexStore.loadText(spark, p) === Some("v2"))
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window A: live swapped aside, tmp not yet published —
    // readers fall back to the aside copy; the next save recovers
    fs.rename(new org.apache.hadoop.fs.Path(p),
      new org.apache.hadoop.fs.Path(p + ".swap-old"))
    assert(IndexStore.loadText(spark, p) === Some("v2"))
    IndexStore.saveText(spark, p, "v3")
    assert(IndexStore.loadText(spark, p) === Some("v3"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p + ".swap-old")))
    // crash window B: a stranded tmp from a dead writer never shadows
    // the live copy and is cleared by the next save
    val out = fs.create(new org.apache.hadoop.fs.Path(p + ".tmp"), true)
    out.write("garbage".getBytes); out.close()
    assert(IndexStore.loadText(spark, p) === Some("v3"))
    IndexStore.saveText(spark, p, "v4")
    assert(IndexStore.loadText(spark, p) === Some("v4"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p + ".tmp")))
  }
}
