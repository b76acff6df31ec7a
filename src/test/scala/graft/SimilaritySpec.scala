package graft

import graft.sim.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("cosine: matches a driver-side computation exactly") {
    val rows = emb.limit(2).select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val (idA, va) = rows(0); val (idB, vb) = rows(1)
    def cosLocal(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0d; var na = 0d; var nb = 0d
      // same sequential fold order as the Catalyst aggregate
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val sparkCos = emb.where($"vec_id" === idA).crossJoin(
        emb.where($"vec_id" === idB).select($"embedding".as("e2")))
      .select(Similarity.cosine($"embedding", $"e2")).head().getDouble(0)
    assert(math.abs(sparkCos - cosLocal(va, vb)) < 1e-12)
  }

  test("cosine of identical vectors is ~1; zero vector guard yields 0") {
    val df = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(0f, 0f, 0f))).toDF("id", "v")
    val self = df.where($"id" === 1).select(Similarity.cosine($"v", $"v")).head().getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
    val z = df.where($"id" === 2).select(Similarity.cosine($"v", $"v")).head().getDouble(0)
    assert(z === 0.0)
  }

  test("brute-force top-k: exact, ranked, self-excluded, deterministic ties") {
    val queries = emb.where($"vec_id" < 3)
    val topk = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect()
    assert(topk.length === 15) // 3 queries × k
    val byQ = topk.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to 5))
      // descending cosine
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(!rows.exists(_.getAs[Long]("vec_id") === q))
    }
  }

  test("ann top-k: recall vs brute force is high on real embeddings") {
    val queries = emb.where($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    // These embeddings are near-orthogonal (top-neighbor cos ≈ 0.2-0.45),
    // so per-plane agreement is barely above 1/2 — the right knob is few
    // planes per table × many tables. Recall is probabilistic; assert a
    // conservative floor + determinism.
    val approx = Similarity.annTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 10, nPlanes = 4, nTables = 16)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    val approx2 = Similarity.annTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 10, nPlanes = 4, nTables = 16)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(approx === approx2)
  }

  test("near-dup pairs: LSH finds every top exact pair it should; exact matches brute force") {
    val exact = Similarity.nearDupPairsExact(emb, "vec_id", "embedding", minCosine = 0.4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val lsh = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
        dim = 64, minCosine = 0.4, nPlanes = 6, nTables = 12)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // no false positives (cosine verified)
    assert((exact intersect lsh).size.toDouble / exact.size >= 0.5)
  }
}
