package graft

import graft.dedup.Dedup
import graft.functions.HashExprs
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class HashExprsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("native minhash_sig is bit-identical to the explode+aggregate path") {
    val k = 16; val n = 8
    val viaAgg = Dedup.minHashSignaturesAgg(docs, "doc_id", "text", k = k, shingleN = n)
      .as[(Long, Seq[Long])].collect().toMap
    val viaExpr = docs
      .where($"text".isNotNull)
      .select($"doc_id",
        HashExprs.minhashSig(TextAnalysis.normalizeText($"text"), n, k).as("sig"))
      .where(size($"sig") > 0)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr.keySet === viaAgg.keySet)
    viaAgg.foreach { case (id, sig) => assert(viaExpr(id) === sig, s"doc $id") }
  }

  test("native simhash64 is bit-identical to the explode+aggregate path") {
    val viaAgg = Dedup.simHashAgg(docs, "doc_id", "text").as[(Long, Long)].collect().toMap
    val viaExpr = docs
      .where($"text".isNotNull)
      .select($"doc_id",
        HashExprs.simhash64(TextAnalysis.normalizeText($"text")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(viaAgg.keySet.subsetOf(viaExpr.keySet))
    viaAgg.foreach { case (id, h) => assert(viaExpr(id) === h, s"doc $id") }
  }

  test("interpreted eval matches codegen (both paths exercised)") {
    val df = Seq((1L, "the quick brown fox"), (2L, "ab")).toDF("id", "t")
    // Codegen path: plain projection inside WholeStageCodegen.
    val gen = df.select($"id", HashExprs.simhash64($"t").as("h"),
      HashExprs.minhashSig($"t", 8, 4).as("s")).collect()
    // Interpreted path: direct expression eval.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val h1 = graft.functions.SimHash64(Literal("the quick brown fox")).eval(null)
    assert(gen.find(_.getLong(0) == 1L).get.getLong(1) === h1)
    val s2 = graft.functions.MinHashSig(Literal("ab"), 8, 4).eval(null)
    assert(s2.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements() === 0)
    assert(gen.find(_.getLong(0) == 2L).get.getSeq[Long](2) === Seq.empty)
  }

  test("minhash windows over code points: non-BMP text keeps bit-parity") {
    // "𝄞" (U+1D11E) is a surrogate pair in UTF-16; char-based windowing
    // would produce a different shingle count AND split the pair.
    val df = Seq((1L, "𝄞abcdefgh foo"), (2L, "日本語のテキストです長い")).toDF("doc_id", "text")
    val viaAgg = Dedup.minHashSignaturesAgg(df, "doc_id", "text", k = 8, shingleN = 8)
      .as[(Long, Seq[Long])].collect().toMap
    val viaExpr = Dedup.minHashSignatures(df, "doc_id", "text", k = 8, shingleN = 8)
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr === viaAgg)
  }

  test("null propagates; empty text yields empty sig / zero simhash") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("id", "t")
    val r = df.select($"id", HashExprs.simhash64($"t").as("h"),
      HashExprs.minhashSig($"t", 8, 4).as("s")).collect()
    val byId = r.map(x => x.getLong(0) -> x).toMap
    assert(byId(1L).isNullAt(1) && byId(1L).isNullAt(2))
    assert(byId(2L).getLong(1) === 0L)
    assert(byId(2L).getSeq[Long](2) === Seq.empty)
  }

  test("match_count: bit-parity with the composed zip_with fold, incl. unequal lengths and nulls") {
    import org.apache.spark.sql.functions.{aggregate, zip_with, when, lit}
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)),
      (2L, Seq(1L, 2L), Seq(1L, 2L, 3L)), // shorter left: padded tail matches 0
      (3L, Seq.empty[Long], Seq(1L)),
      (4L, Seq(7L, 7L, 7L), Seq(7L, 7L, 7L))
    ).toDF("id", "a", "b")
    val both = df.select($"id",
      HashExprs.matchCount($"a", $"b").as("native"),
      aggregate(
        zip_with($"a", $"b", (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).as("composed"))
      .collect()
    both.foreach(r => assert(r.getInt(1) === r.getInt(2), s"id=${r.getLong(0)}"))
    assert(both.find(_.getLong(0) == 1L).get.getInt(1) === 3)
    assert(both.find(_.getLong(0) == 4L).get.getInt(1) === 3)
    // null input → null out
    val nr = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
      .select(HashExprs.matchCount($"a", $"b")).collect().head
    assert(nr.isNullAt(0))
    // null ELEMENTS never match (x = y is null-valued → otherwise(0)),
    // even null-vs-null — parity with the composed fold, not with
    // ArrayData.getLong's silent 0
    val ne = Seq((Seq[java.lang.Long](null, 2L, null), Seq[java.lang.Long](null, 2L, 0L)))
      .toDF("a", "b")
      .select(HashExprs.matchCount($"a", $"b").as("native"),
        aggregate(
          zip_with($"a", $"b", (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).as("composed"))
      .collect().head
    assert(ne.getInt(0) === 1 && ne.getInt(1) === 1)
  }
}
