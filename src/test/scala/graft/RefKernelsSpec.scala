package graft

import graft.functions.RefKernels
import org.apache.spark.sql.functions._

class RefKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("window counter / remaining / progress (30s tumbling, TOTP analog)") {
    val df = Seq(0L, 29L, 30L, 59L, 60L, 1700000000L).toDF("ts")
    val r = df.select($"ts",
      RefKernels.windowCounter($"ts", 30).as("ctr"),
      RefKernels.windowRemaining($"ts", 30).as("rem"),
      RefKernels.windowProgress($"ts", 30).as("prog")).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(0L) === ((0L, 30L, 1.0)))
    assert(r(29L) === ((0L, 1L, 1.0 / 30)))
    assert(r(30L) === ((1L, 30L, 1.0)))
    assert(r(59L) === ((1L, 1L, 1.0 / 30)))
    assert(r(1700000000L)._1 === 1700000000L / 30)
  }

  test("initial and code grouping match reference display kernels") {
    val r = Seq(("alice", "123456"), ("", "1234567"), (null, "987654"))
      .toDF("name", "code")
      .select(RefKernels.initial($"name").as("i"), RefKernels.groupCode($"code").as("g"))
      .collect()
    assert(r(0).getString(0) === "A" && r(0).getString(1) === "123 456")
    assert(r(1).getString(0) === "?" && r(1).getString(1) === "1234567") // non-6 passthrough
    assert(r(2).getString(0) === "?" && r(2).getString(1) === "987 654")
  }

  test("dynamic truncation matches RFC 4226 test vector") {
    // RFC 4226 appendix D: HMAC-SHA-1 of (secret "12345678901234567890",
    // counter 0) = cc93cf18508d94934c64b65d8ba7667fb7cde4b0 → code 755224.
    val hmacHex = "cc93cf18508d94934c64b65d8ba7667fb7cde4b0"
    val r = Seq(Tuple1(hmacHex)).toDF("h")
      .select(RefKernels.dynamicTruncate(unhex($"h"), 6).as("code"))
      .head().getString(0)
    assert(r === "755224")
  }

  test("hex codec round-trips") {
    val r = Seq(Tuple1("hello")).toDF("s")
      .select(RefKernels.hexDecode(RefKernels.hexEncode($"s".cast("binary"))).cast("string"))
      .head().getString(0)
    assert(r === "hello")
  }

  test("envelope encode/decode round-trips with version gate fields") {
    val df = Seq(Tuple1("payload-bytes")).toDF("p")
      .withColumn("salt", lit("0123456789abcdef").cast("binary")) // 16B
      .withColumn("iv", lit("0123456789ab").cast("binary")) // 12B
    val enc = df.select(
      RefKernels.envelopeEncode(1, $"salt", $"iv", $"p".cast("binary")).as("b64"))
    val dec = enc.select(RefKernels.envelopeDecode($"b64", 16, 12).as("e"))
      .select($"e.version", $"e.salt".cast("string"), $"e.iv".cast("string"),
        $"e.payload".cast("string"))
      .head()
    assert(dec.getInt(0) === 1)
    assert(dec.getString(1) === "0123456789abcdef")
    assert(dec.getString(2) === "0123456789ab")
    assert(dec.getString(3) === "payload-bytes")
  }

  test("envelope auto-decode: length-dispatched legacy fallback (rust/src/lib.rs:118-135)") {
    val salt = "0123456789abcdef" // 16 B
    val iv = "0123456789ab" // 12 B

    // Versioned envelope → version parsed, legacy=false.
    val v = Seq(Tuple1("payload-bytes")).toDF("p")
      .select(RefKernels.envelopeEncode(1,
        lit(salt).cast("binary"), lit(iv).cast("binary"), $"p".cast("binary")).as("b64"))
      .select(RefKernels.envelopeDecodeAuto($"b64", 16, 12).as("e"))
      .select($"e.version", $"e.legacy", $"e.salt".cast("string"),
        $"e.payload".cast("string"))
      .head()
    assert(v.getInt(0) === 1)
    assert(v.getBoolean(1) === false)
    assert(v.getString(2) === salt)
    assert(v.getString(3) === "payload-bytes")

    // Legacy (versionless) envelope: the reference dispatches on LENGTH
    // — the versionless branch only wins when the buffer is exactly too
    // short for [version][salt][iv][ct≥1], i.e. salt+iv+1 bytes.
    val l = Seq(Tuple1("x")).toDF("p")
      .select(base64(concat(lit(salt).cast("binary"), lit(iv).cast("binary"),
        lit("c").cast("binary"))).as("b64"))
      .select(RefKernels.envelopeDecodeAuto($"b64", 16, 12).as("e"))
      .select($"e.version", $"e.legacy", $"e.salt".cast("string"),
        $"e.iv".cast("string"), $"e.payload".cast("string"))
      .head()
    assert(l.isNullAt(0)) // no version byte in the legacy layout
    assert(l.getBoolean(1) === true)
    assert(l.getString(2) === salt)
    assert(l.getString(3) === iv)
    assert(l.getString(4) === "c")

    // Too short for either layout → null struct (InvalidData channel).
    val bad = Seq(Tuple1("too-short")).toDF("p")
      .select(base64($"p".cast("binary")).as("b64"))
      .select(RefKernels.envelopeDecodeAuto($"b64", 16, 12).as("e"))
      .head()
    assert(bad.isNullAt(0))
  }

  test("version compare: numeric, not lexicographic; longer wins ties") {
    val cases = Seq(
      ("1.2.3", "1.2.3", 0),
      ("1.10.0", "1.9.9", 1), // numeric: 10 > 9 (lexicographic would say less)
      ("2.0", "10.0", -1),
      ("1.2.3.1", "1.2.3", 1), // longer wins
      ("1.2.3", "1.2.3.0.0.1", -1),
      ("1", "1.0", -1), // longer wins even when the extra part is 0 (reference: latestParts.size > currParts.size)
      ("1.x.2", "1.2", 0), // non-numeric parts dropped (toIntOrNull+mapNotNull), not zeroed
      ("0.9", "1.0", -1))
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(RefKernels.versionCompare($"a", $"b")).as[Int].collect()
    assert(got.toSeq === cases.map(_._3))
  }
}
