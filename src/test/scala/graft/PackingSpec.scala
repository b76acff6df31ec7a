package graft

import graft.pack.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")

  test("packs respect the budget up to one-document overflow; no doc lost or duplicated") {
    val budget = 2000L
    val packed = Packing.packByBudget(docs, "doc_id", "n_chars", budget, nBuckets = 16)
    val n = docs.where($"doc_id".isNotNull && $"n_chars" > 0).count()
    assert(packed.count() === n) // partition of the corpus
    assert(packed.select($"doc_id").distinct().count() === n)

    val maxW = docs.agg(max($"n_chars")).head().getLong(0)
    val packs = Packing.packSummary(docs, "doc_id", "n_chars", budget, nBuckets = 16)
      .collect()
    assert(packs.nonEmpty)
    // first-fit-by-start: total ≤ budget + (one doc's weight - 1)
    packs.foreach { p =>
      assert(p.getAs[Long]("total_weight") <= budget + maxW,
        s"pack over budget+maxDoc: $p")
    }
    // real invariants of first-fit-by-start: every bucket starts at
    // pack 0, ids never exceed the doc count (a doc with weight >
    // budget may SKIP ids — density is not an invariant), and no pack
    // id is negative
    packs.groupBy(_.getAs[Int]("pack_bucket")).foreach { case (_, ps) =>
      val ids = ps.map(_.getAs[Long]("pack_id"))
      val totW = ps.map(_.getAs[Long]("total_weight")).sum
      assert(ids.min === 0L)
      assert(ids.forall(_ >= 0L))
      // a doc's pack id = floor(startOffset/budget) < totalWeight/budget + 1
      assert(ids.max <= totW / budget)
    }
  }

  test("packing is deterministic and parallelism-invariant") {
    def run(parts: Int) = Packing
      .packByBudget(docs.repartition(parts), "doc_id", "n_chars", 2000L, nBuckets = 16)
      .select($"doc_id", $"pack_bucket", $"pack_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(run(3) === run(17))
  }
}
