package graft.util

import org.json4s._

/** Shared JSON leaf parsing/rendering for the data codecs
  * (`graft.schema.SchemaJson`, `graft.verdict.ExpectJson`). One home
  * for the canonical-form rules — in particular [[jnum]]'s
  * integral-double rendering — so the two codecs can never drift apart
  * on what "canonical" means. `ctx` is the caller-built error prefix
  * (codec + field/entry), keeping every failure self-locating.
  */
private[graft] object JsonLeaf {

  def fail(ctx: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$ctx: $msg")

  def kind(jv: JValue): String = jv.getClass.getSimpleName

  def str(ctx: String, key: String, jv: JValue): String = jv match {
    case JString(s) => s
    case other => fail(ctx, s"$key must be a string, got ${kind(other)}")
  }

  def num(ctx: String, key: String, jv: JValue): Double = jv match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case other => fail(ctx, s"$key must be a number, got ${kind(other)}")
  }

  /** Integral doubles render as JSON integers (canonical form — `100`
    * not `100.0`); [[num]] parses either shape back to the same Double.
    */
  def jnum(d: Double): JValue =
    if (d.isWhole && math.abs(d) < 1e15) JInt(BigInt(d.toLong)) else JDouble(d)

  /** Reject duplicate keys in one JSON object — parsers keep both, and
    * last-wins folding is exactly the silent-collision class the strict
    * codecs exist to reject.
    */
  def requireDistinctKeys(ctx: String, fields: List[(String, JValue)]): Unit = {
    val dup = fields.map(_._1).groupBy(identity).collect {
      case (k, ks) if ks.length > 1 => k
    }
    require(dup.isEmpty, s"$ctx: duplicate keys: ${dup.toSeq.sorted.mkString(", ")}")
  }
}
