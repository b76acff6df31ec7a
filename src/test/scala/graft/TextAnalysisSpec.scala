package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(
      (1L, "hello world"),
      (2L, "  spaced   out  "),
      (3L, ""),
      (4L, "don't split-up v2.0!"),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val r = df.select($"id",
      TextAnalysis.tokenCountWs($"text").as("ws"),
      TextAnalysis.tokenCountBpe($"text").as("bpe"))
      .collect().map(x => x.getLong(0) -> (Option(x.get(1)), Option(x.get(2)))).toMap
    assert(r(1L) === (Some(2), Some(2)))
    assert(r(2L) === (Some(2), Some(2)))
    assert(r(3L) === (Some(0), Some(0)))
    // don ' t split - up v 2 . 0 !  → 11 BPE-ish tokens
    assert(r(4L) === (Some(3), Some(11)))
    assert(r(5L) === (None, None))
  }

  test("quality features: ratios bounded, stopword-rich text scores higher") {
    val df = Seq(
      (1L, "the cat and the dog sat in the warm sun for it was a good day"),
      (2L, "@@@@ #### $$$$ %%%% ^^^^")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df, "text")
      .select($"doc_id", $"alpha_ratio", $"punct_ratio", $"stop_ratio", $"quality")
      .collect().map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    val (a1, _, s1, q1) = r(1L)
    val (a2, _, s2, q2) = r(2L)
    assert(a1 > 0.7 && s1 > 0.3)
    assert(a2 === 0.0 && s2 === 0.0)
    assert(q1 > q2)
    r.values.foreach { case (a, p, s, q) =>
      assert(a >= 0 && a <= 1 && p >= 0 && p <= 1 && s >= 0 && q >= 0 && q <= 1)
    }
  }

  test("langid: stopword heuristic picks the right language") {
    val df = Seq(
      (1L, "the cat and the dog sat in the house with a friend"),
      (2L, "der hund und die katze ist nicht mit der maus"),
      (3L, "el perro y la casa que los gatos en un lugar"),
      (4L, "le chien et les chats des animaux en un lieu du parc est"),
      (5L, "xyzzy plugh qwerty"),
      (6L, "中文文本")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.langId(df, "text")
      .select($"doc_id", $"lang_pred").as[(Long, String)].collect().toMap
    assert(r(1L) === "en")
    assert(r(2L) === "de")
    assert(r(3L) === "es")
    assert(r(4L) === "fr")
    assert(r(5L) === "und")
    assert(r(6L) === "zh")
  }

  test("fingerprint: normalization-invariant, matches MessageDigest") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "different")).toDF("doc_id", "text")
    val r = TextAnalysis.fingerprint(df, "text")
      .select($"doc_id", $"content_sha", $"fp64").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toList
    val byId = r.map(t => t._1 -> t._2).toMap
    assert(byId(1L) === byId(2L)) // case/whitespace-insensitive
    assert(byId(1L) !== byId(3L))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byId(1L) === expect)
    assert(r.forall(t => t._3 === t._2.take(16)))
  }

  test("shingle hashes: deterministic, short-text empty, distinct") {
    val df = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "abcdefghij")).toDF("id", "text")
    val r = df.select($"id", TextAnalysis.shingleHashes($"text", 8).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(r(1L).length === 3) // 10 - 8 + 1
    assert(r(2L) === Seq.empty)
    assert(r(1L) === r(3L))
  }
}
