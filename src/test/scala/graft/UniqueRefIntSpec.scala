package graft

import graft.data.SynthGen
import graft.refint.RefIntegrity
import graft.unique.Uniqueness
import org.apache.spark.sql.functions._

class UniqueRefIntSpec extends SparkSpec {
  import spark.implicits._

  private lazy val files = SynthGen.codeFiles(spark, SynthGen.Config(rows = 6000L))
  private val key = Seq("repo", "path", "commit")

  test("duplicates flags ALL rows of a dup group; summary math agrees") {
    val dups = Uniqueness.duplicates(files, key)
    val sum = Uniqueness.summary(files, key).first()
    val (nRows, nKeys, nDupKeys, nDupRows) =
      (sum.getLong(0), sum.getLong(1), sum.getLong(2), sum.getLong(3))
    assert(nRows === files.count())
    assert(dups.count() === nDupRows)
    assert(nDupRows > nDupKeys && nDupKeys > 0)
    assert(nRows - nDupRows === nKeys - nDupKeys) // singleton count equality
  }

  test("dedup keeps exactly one row per key and is idempotent") {
    val d1 = Uniqueness.dedup(files, key, Seq(col("id")))
    assert(d1.count() === Uniqueness.summary(files, key).first().getLong(1))
    val d2 = Uniqueness.dedup(d1, key, Seq(col("id")))
    assert(d2.count() === d1.count())
  }

  test("salted group counts equal unsalted counts (skew-spread invariance)") {
    val salted = Uniqueness.groupCountsSalted(files, "repo", nSalts = 16)
    val plain = files.groupBy("repo").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt assignment is deterministic across repartitionings (engine determinism rule)") {
    // The salt is a full-row hash, not a partition-layout artifact: the
    // per-(key, salt) PARTIALS — not just the final counts — must be
    // identical at any partitioning, so reruns and resumes see the
    // same intermediate frames everywhere.
    def partials(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__salt",
          pmod(xxhash64(df.columns.map(col): _*), lit(16L)))
        .groupBy(col("repo"), col("__salt")).count()
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(partials(files) === partials(files.repartition(7)))
    // and the hot key actually spreads over many salts
    val hot = files.groupBy("repo").count().orderBy(col("count").desc)
      .first().getString(0)
    val spread = files.where(col("repo") === hot)
      .withColumn("__salt",
        pmod(xxhash64(files.columns.map(col): _*), lit(16L)))
      .select("__salt").distinct().count()
    assert(spread >= 12) // 16 salts, hot repo lands in nearly all
  }

  test("RI orphans: rows missing from dim are flagged; null keys are not orphans") {
    val dim = SynthGen.dimCommits(spark, SynthGen.Config(rows = 6000L))
    val orphans = RefIntegrity.orphans(files, dim, Seq("repo", "commit"))
    assert(orphans.count() > 0)
    assert(orphans.where(col("repo").isNull || col("commit").isNull).count() === 0)
    val s = RefIntegrity.summary(files, dim, Seq("repo", "commit")).first()
    assert(s.getLong(0) === files.count())
    assert(s.getLong(2) === orphans.count())
    // matched + orphans + null-keyed = all rows
    val matched = RefIntegrity.matched(files, dim, Seq("repo", "commit")).count()
    assert(matched + s.getLong(2) + s.getLong(1) === s.getLong(0))
  }

  test("bloom RI: exact path is row-identical to the plain anti-join") {
    val dim = SynthGen.dimCommits(spark, SynthGen.Config(rows = 6000L))
    val bloom = RefIntegrity.buildKeyBloom(
      dim, Seq("repo", "commit"), expectedItems = 10000L, fpp = 0.01)
    val plain = RefIntegrity.orphans(files, dim, Seq("repo", "commit"))
    val fast = RefIntegrity.orphansWithBloom(
      files, dim, Seq("repo", "commit"), bloom)
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty)
    val s1 = RefIntegrity.summary(files, dim, Seq("repo", "commit")).first()
    val s2 = RefIntegrity.summaryWithBloom(
      files, dim, Seq("repo", "commit"), bloom).first()
    assert(s1 === s2)
  }

  test("bloom RI: approximate orphans are a subset with bounded misses, zero false orphans") {
    val dim = SynthGen.dimCommits(spark, SynthGen.Config(rows = 6000L))
    val bloom = RefIntegrity.buildKeyBloom(
      dim, Seq("repo", "commit"), expectedItems = 10000L, fpp = 0.01)
    val plain = RefIntegrity.orphans(files, dim, Seq("repo", "commit"))
    val approx = RefIntegrity.orphansApprox(files, Seq("repo", "commit"), bloom)
    // probe-miss is definitive: no approx orphan that isn't a real one
    assert(approx.exceptAll(plain).isEmpty)
    // misses are the fpp collisions only: recall well above 1 - 10*fpp
    val (nPlain, nApprox) = (plain.count(), approx.count())
    assert(nPlain > 0)
    assert(nApprox >= (nPlain * 0.9).toLong,
      s"approx found $nApprox of $nPlain orphans")
    assert(approx.where(col("repo").isNull || col("commit").isNull).count() === 0)
  }
}
