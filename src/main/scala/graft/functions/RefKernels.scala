package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-function ports of the reference's small per-row kernels —
  * SURVEY.md §2d/§2a rows that aren't already covered by the rule
  * compiler or the hash expressions. Each cites its reference site;
  * all are pure built-in compositions (codegen-friendly, no UDFs).
  */
object RefKernels {

  /** F13 — tumbling-window assignment: `counter = epochSeconds / period`
    * (reference rust/src/lib.rs:192: `timestamp / period` for TOTP).
    */
  def windowCounter(epochSeconds: Column, periodSeconds: Int): Column =
    floor(epochSeconds / periodSeconds).cast("long")

  /** F13 — seconds remaining in the current window and progress within
    * it (reference app/.../TotpUtil.kt:32-41: `30 - now % 30`).
    */
  def windowRemaining(epochSeconds: Column, periodSeconds: Int): Column =
    lit(periodSeconds) - pmod(epochSeconds, lit(periodSeconds))

  def windowProgress(epochSeconds: Column, periodSeconds: Int): Column =
    windowRemaining(epochSeconds, periodSeconds).cast("double") / periodSeconds

  /** F10 — display initial: first character uppercased, "?" fallback
    * (reference app/.../HomeScreen.kt:830).
    */
  def initial(c: Column): Column =
    when(c.isNull || length(c) === 0, lit("?"))
      .otherwise(upper(substring(c, 1, 1)))

  /** F11 — 6-digit code display grouping "xxx xxx"
    * (reference app/.../HomeScreen.kt:601).
    */
  def groupCode(c: Column): Column =
    when(length(c) === 6,
      concat_ws(" ", substring(c, 1, 3), substring(c, 4, 3)))
      .otherwise(c)

  /** F2 — RFC-4226 dynamic truncation + zero-padded n-digit code from a
    * 20-byte (or longer) HMAC value (reference rust/src/lib.rs:200-207):
    * low nibble of the last byte is the offset, 31-bit big-endian int
    * from 4 bytes at that offset, mod 10^digits, left-padded.
    */
  def dynamicTruncate(hmac: Column, digits: Int): Column = {
    val hexStr = hex(hmac)
    // offset = low nibble of the last byte
    val offset = conv(substring(hexStr, -2, 2), 16, 10).cast("int")
      .bitwiseAND(lit(0x0f))
    // 31-bit big-endian word at that byte offset (2 hex chars per byte)
    val word = conv(hexStr.substr(offset * 2 + 1, lit(8)), 16, 10).cast("long")
    val bound = word.bitwiseAND(lit(0x7fffffffL))
    lpad(pmod(bound, lit(math.pow(10, digits).toLong)).cast("string"), digits, "0")
  }

  /** F6 — hex codec (reference rust/src/lib.rs:156-158 stores hash and
    * salt hex-encoded, lowercase).
    */
  def hexEncode(c: Column): Column = lower(hex(c))
  def hexDecode(c: Column): Column = unhex(c)

  /** F7/S5 — Base64 envelope codec. Encode packs
    * `[version:1B][salt][iv][payload]` and Base64s it; decode splits it
    * back with the version gate (reference rust/src/lib.rs:102-135:
    * version byte checked first, then fixed-length salt/iv slices).
    * Returns a struct (version, salt, iv, payload) of binary columns.
    */
  def envelopeEncode(version: Int, salt: Column, iv: Column, payload: Column): Column =
    base64(concat(unhex(format_string("%02x", lit(version))), salt, iv, payload))

  def envelopeDecode(b64: Column, saltLen: Int, ivLen: Int): Column = {
    val hexStr = hex(unbase64(b64))
    struct(
      conv(substring(hexStr, 1, 2), 16, 10).cast("int").as("version"),
      unhex(substring(hexStr, 3, saltLen * 2)).as("salt"),
      unhex(substring(hexStr, 3 + saltLen * 2, ivLen * 2)).as("iv"),
      unhex(substring(hexStr, 3 + saltLen * 2 + ivLen * 2, 1000000000)).as("payload"))
  }

  /** S5/O9 — length-dispatched decode with the LEGACY (versionless)
    * fallback of reference rust/src/lib.rs:118-135: an envelope long
    * enough to hold `[version][salt][iv][ct≥1]` parses as versioned
    * (the version gate is the caller's rule, cf. V9); one that only
    * fits `[salt][iv][ct≥1]` parses as the legacy layout starting at
    * byte 0 with `version = null, legacy = true`; anything shorter is
    * invalid data → null struct (the reference's InvalidData channel —
    * violations are data, never exceptions).
    */
  def envelopeDecodeAuto(b64: Column, saltLen: Int, ivLen: Int): Column = {
    val bin = unbase64(b64)
    val hexStr = hex(bin)
    val nBytes = length(bin)
    def slices(offsetBytes: Int) = Seq(
      unhex(substring(hexStr, offsetBytes * 2 + 1, saltLen * 2)).as("salt"),
      unhex(substring(hexStr, offsetBytes * 2 + 1 + saltLen * 2, ivLen * 2)).as("iv"),
      unhex(substring(hexStr, offsetBytes * 2 + 1 + (saltLen + ivLen) * 2, 1000000000))
        .as("payload"))
    val versioned = struct(
      (conv(substring(hexStr, 1, 2), 16, 10).cast("int").as("version") +:
        slices(1)) :+ lit(false).as("legacy"): _*)
    val legacy = struct(
      (lit(null).cast("int").as("version") +:
        slices(0)) :+ lit(true).as("legacy"): _*)
    when(nBytes >= 1 + saltLen + ivLen + 1, versioned)
      .when(nBytes >= saltLen + ivLen + 1, legacy)
  }

  /** F12 — numeric version-string compare (reference
    * app/.../HomeViewModel.kt:245-254): split on ".", compare numeric
    * parts left to right, longer-wins tiebreak. Returns -1/0/1.
    */
  def versionCompare(a: Column, b: Column): Column = {
    // Reference semantics exactly (toIntOrNull + mapNotNull): parts
    // that don't parse as ints are DROPPED (not zeroed); numeric parts
    // compare positionwise over the common prefix; if that ties, the
    // version with MORE parts wins ("1.0" > "1", unlike zero-padding
    // which would call them equal).
    def parts(c: Column) =
      filter(transform(split(c, "\\."), s => s.try_cast("int")), x => x.isNotNull)
    val pa = parts(a)
    val pb = parts(b)
    val common = least(size(pa), size(pb))
    val diff = filter(
      zip_with(slice(pa, lit(1), common), slice(pb, lit(1), common), (x, y) => x - y),
      d => d =!= 0)
    when(size(diff) > 0,
      when(element_at(diff, 1) > 0, lit(1)).otherwise(lit(-1)))
      .when(size(pa) > size(pb), lit(1))
      .when(size(pa) < size(pb), lit(-1))
      .otherwise(lit(0))
  }
}
