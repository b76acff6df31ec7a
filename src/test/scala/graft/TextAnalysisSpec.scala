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

  test("repetition features: dup/top fractions, symbols, null and empty edges") {
    val df = Seq(
      (1L, "a a a b"),          // 4 words, 2 distinct, top word a×3, top bigram "a a"×2
      (2L, "x y z"),            // all distinct
      (3L, ""),                 // empty → zero ratios
      (4L, null.asInstanceOf[String]),
      (5L, "w! #$%")            // symbols
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionFeatures(df, "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_words") === 4L)
    assert(r(1L).getAs[Long]("n_distinct_words") === 2L)
    assert(r(1L).getAs[Double]("dup_word_frac") === 0.5)
    assert(r(1L).getAs[Double]("top_word_frac") === 0.75)
    assert(math.abs(r(1L).getAs[Double]("top_bigram_frac") - 2.0 / 3) < 1e-12)
    assert(r(2L).getAs[Double]("dup_word_frac") === 0.0)
    assert(r(2L).getAs[Double]("top_word_frac") === 1.0 / 3)
    assert(r(3L).getAs[Long]("n_words") === 0L)
    assert(r(3L).getAs[Double]("top_word_frac") === 0.0)
    assert(r(3L).getAs[Double]("top_bigram_frac") === 0.0)
    assert(r(4L).isNullAt(r(4L).fieldIndex("n_words")))
    assert(r(4L).isNullAt(r(4L).fieldIndex("top_word_frac")))
    // "w! #$%" → 5 non-space chars... text has 6 chars, symbols are ! # $ %
    assert(math.abs(r(5L).getAs[Double]("symbol_ratio") - 4.0 / 6) < 1e-12)
  }

  test("maxRunLength: longest equal-adjacent run in a sorted array") {
    val df = Seq(
      (1L, Seq("a", "a", "a", "b")),
      (2L, Seq("a", "b", "c")),
      (3L, Seq.empty[String])
    ).toDF("id", "arr")
    val r = df.select($"id", TextAnalysis.maxRunLength($"arr").as("m"))
      .as[(Long, Int)].collect().toMap
    assert(r === Map(1L -> 3, 2L -> 1, 3L -> 0))
  }

  test("PII redaction: counts per category and ordered replacement") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@mail.example.org now"),
      (2L, "see https://ex.org/a?b=1 and http://plain.net/x"),
      (3L, "node 192.168.001.042 up"),
      (4L, "acct 123456789012 ok, short 12345678 kept"),
      (5L, null.asInstanceOf[String]),
      (6L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_email") === 1L)
    assert(r(1L).getAs[String]("text_redacted") === "mail me at <EMAIL> now")
    assert(r(2L).getAs[Long]("n_url") === 2L)
    assert(r(2L).getAs[String]("text_redacted") === "see <URL> and <URL>")
    assert(r(3L).getAs[Long]("n_ipv4") === 1L)
    assert(r(3L).getAs[String]("text_redacted") === "node <IP> up")
    // ≥9-digit runs redact; the 8-digit run stays
    assert(r(4L).getAs[Long]("n_id_digits") === 1L)
    assert(r(4L).getAs[String]("text_redacted") === "acct <ID> ok, short 12345678 kept")
    assert(r(5L).isNullAt(r(5L).fieldIndex("n_email")))
    assert(r(5L).isNullAt(r(5L).fieldIndex("text_redacted")))
    assert(r(6L).getAs[String]("text_redacted") === "clean text with no pii at all")
    assert(Seq("n_url", "n_email", "n_ipv4", "n_id_digits")
      .forall(c => r(6L).getAs[Long](c) === 0L))
  }

  test("top tokens: exact counts, deterministic tie-break, k cap") {
    val df = Seq(
      (1L, "b b b a a c"),
      (2L, "a  B c d"), // normalization folds case/whitespace
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextAnalysis.topTokens(df, "text", k = 3)
      .as[(String, Long, Long)].collect().toList
    // counts: b→4, a→3, c→2, d→1; ties broken by token asc
    assert(r === List(("b", 4L, 1L), ("a", 3L, 2L), ("c", 2L, 3L)))
  }
}
