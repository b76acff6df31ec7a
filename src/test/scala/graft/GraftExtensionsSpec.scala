package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions match the Column API after registration") {
    GraftExtensions.register(spark)
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT simhash64(text) AS sh, minhash_sig(text, 8, 16) AS mh
        |FROM ext_docs""".stripMargin).head()
    val viaApi = spark.table("ext_docs").select(
      graft.functions.HashExprs.simhash64($"text").as("sh"),
      graft.functions.HashExprs.minhashSig($"text", 8, 16).as("mh")).head()
    assert(viaSql.getLong(0) === viaApi.getLong(0))
    assert(viaSql.getSeq[Long](1) === viaApi.getSeq[Long](1))

    val dot = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))").head().getDouble(0)
    assert(dot === 11.0)
  }

  test("config-injected extensions work at session build") {
    // A sibling session with spark.sql.extensions set; verifies the
    // spark-submit --conf route.
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // getOrCreate may return the shared session (extensions already
      // registered there by the previous test either way) — assert the
      // function resolves and computes.
      val r = s2.sql("SELECT simhash64('hello world')").head().getLong(0)
      val expect = graft.functions.SimHash64.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world"))
      assert(r === expect)
    } finally ()
  }

  test("argument validation: wrong arity fails analysis") {
    GraftExtensions.register(spark)
    intercept[Exception] { spark.sql("SELECT simhash64('a', 'b')").collect() }
    intercept[Exception] { spark.sql("SELECT minhash_sig('a')").collect() }
  }
}
