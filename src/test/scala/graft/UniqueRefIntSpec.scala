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
}
