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

  test("auto bucket count bounds per-bucket rows at any input size") {
    val target = 100L
    // two input sizes: 500 rows (sf0.01 docs) and ~5x that via union
    val small = docs
    val large = (1 to 5).map(i =>
      docs.withColumn("doc_id", $"doc_id" + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    Seq(small, large).foreach { df =>
      val n = df.where($"doc_id".isNotNull && $"n_chars".isNotNull && $"n_chars" > 0).count()
      val nb = Packing.autoBucketCount(df, "doc_id", "n_chars", target)
      assert(nb === math.max(1L, (n + target - 1) / target).toInt)
      val perBucket = Packing
        .packByBudgetAuto(df, "doc_id", "n_chars", 2000L, target)
        .groupBy($"pack_bucket").count().agg(max($"count")).head().getLong(0)
      // md5 spread is uniform-ish: no bucket should exceed ~3x target
      assert(perBucket <= 3 * target,
        s"bucket of $perBucket rows at n=$n, nb=$nb — sizing not bounded")
    }
    // derived counts actually differ between the two sizes
    assert(Packing.autoBucketCount(large, "doc_id", "n_chars", target) >
      Packing.autoBucketCount(small, "doc_id", "n_chars", target))
  }

  test("packing is deterministic and parallelism-invariant") {
    def run(parts: Int) = Packing
      .packByBudget(docs.repartition(parts), "doc_id", "n_chars", 2000L, nBuckets = 16)
      .select($"doc_id", $"pack_bucket", $"pack_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(run(3) === run(17))
  }
}
