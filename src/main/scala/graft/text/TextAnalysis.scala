package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language identification, and
  * document fingerprinting — all pure Catalyst `Column` expressions
  * (zero UDFs, whole-stage codegen end-to-end), so they run as a single
  * projection over the scan at any scale.
  *
  * Semantics grounding in the reference: normalize-before-compute
  * (uppercase/strip at reference app/.../TotpUtil.kt:26,
  * rust/src/lib.rs:185) and hash-based fingerprint-then-compare
  * (rust/src/lib.rs:161-172).
  */
object TextAnalysis {

  /** Canonical text normalization: lowercase + collapse whitespace. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  // -------------------------------------------------------------------
  // Token counting
  // -------------------------------------------------------------------

  /** Whitespace token count (0 for empty/blank). */
  def tokenCountWs(c: Column): Column =
    when(c.isNull, lit(null))
      .when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one token (a cheap stand-in
    * for a byte-pair tokenizer's pre-tokenization split).
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenCountBpe(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(regexp_count(c, lit(bpeTokenPattern)))

  // -------------------------------------------------------------------
  // Quality scoring
  // -------------------------------------------------------------------

  /** English-ish stopword set used for both quality and language ID. */
  val stopwordsEn = Seq("the", "and", "of", "to", "in", "is", "that", "for", "it", "with", "a")
  val stopwordsDe = Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu")
  val stopwordsEs = Seq("el", "la", "los", "que", "y", "en", "un", "por", "con", "se")
  val stopwordsFr = Seq("le", "la", "les", "et", "des", "en", "un", "du", "est", "que")

  private def wordSetPattern(ws: Seq[String]): String =
    ws.mkString("\\b(", "|", ")\\b")

  /** Count of stopword occurrences (case-insensitive via pre-lowering). */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    regexp_count(lower(c), lit(wordSetPattern(words)))

  /** The composite quality score in [0, 1] as ONE expression —
    * reusable inside short-circuiting conditionals (e.g. the one-pass
    * pipeline funnel evaluates it only on dedup survivors). Formula is
    * fixed (mirrored verbatim in the DuckDB oracle):
    * 0.4·alpha_ratio + 0.3·min(1, stop_ratio·4) + 0.3·min(1, n_tokens/50).
    */
  def qualityScore(t: Column): Column = {
    val nChars = length(t)
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", ""))
    val nTok = tokenCountWs(t)
    val nStop = stopwordCount(t, stopwordsEn)
    val alphaRatio = when(nChars > 0, nAlpha.cast("double") / nChars).otherwise(lit(0d))
    val stopRatio = when(nTok > 0, nStop.cast("double") / nTok).otherwise(lit(0d))
    lit(0.4) * alphaRatio +
      lit(0.3) * least(lit(1d), stopRatio * 4) +
      lit(0.3) * least(lit(1d), nTok.cast("double") / 50)
  }

  /** Per-document quality features + a composite score in [0, 1].
    *
    * Columns: `n_chars_txt`, `n_tokens`, `alpha_ratio`, `punct_ratio`,
    * `stop_ratio`, `mean_word_len`, `quality` (= [[qualityScore]]).
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", ""))
    val nPunct = length(regexp_replace(t, "[^.,;:!?'\"()\\[\\]-]", ""))
    val nTok = tokenCountWs(t)
    val nStop = stopwordCount(t, stopwordsEn)
    val alphaRatio = when(nChars > 0, nAlpha.cast("double") / nChars).otherwise(lit(0d))
    val punctRatio = when(nChars > 0, nPunct.cast("double") / nChars).otherwise(lit(0d))
    val stopRatio = when(nTok > 0, nStop.cast("double") / nTok).otherwise(lit(0d))
    val meanWordLen = when(nTok > 0, nAlpha.cast("double") / nTok).otherwise(lit(0d))
    val quality = qualityScore(t)
    df.withColumn("n_chars_txt", nChars)
      .withColumn("n_tokens", nTok)
      .withColumn("alpha_ratio", alphaRatio)
      .withColumn("punct_ratio", punctRatio)
      .withColumn("stop_ratio", stopRatio)
      .withColumn("mean_word_len", meanWordLen)
      .withColumn("quality", quality)
  }

  // -------------------------------------------------------------------
  // Language identification (n-gram/stopword heuristic)
  // -------------------------------------------------------------------

  /** Stopword-hit scores per candidate language + `lang_pred`.
    *
    * Decision rule (deterministic, mirrored in SQL): CJK characters
    * present → `zh`; otherwise the max-scoring language in fixed
    * priority order en > de > es > fr; all-zero → `und`.
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val sEn = stopwordCount(t, stopwordsEn)
    val sDe = stopwordCount(t, stopwordsDe)
    val sEs = stopwordCount(t, stopwordsEs)
    val sFr = stopwordCount(t, stopwordsFr)
    val hasCjk = regexp_count(t, lit("[\\x{4e00}-\\x{9fff}]")) > 0
    val pred = when(t.isNull, lit(null))
      .when(hasCjk, lit("zh"))
      .when(sEn === 0 && sDe === 0 && sEs === 0 && sFr === 0, lit("und"))
      .when(sEn >= sDe && sEn >= sEs && sEn >= sFr, lit("en"))
      .when(sDe >= sEs && sDe >= sFr, lit("de"))
      .when(sEs >= sFr, lit("es"))
      .otherwise(lit("fr"))
    df.withColumn("s_en", sEn)
      .withColumn("s_de", sDe)
      .withColumn("s_es", sEs)
      .withColumn("s_fr", sFr)
      .withColumn("lang_pred", pred)
  }

  // -------------------------------------------------------------------
  // Document fingerprinting
  // -------------------------------------------------------------------

  /** Full-content fingerprint: sha256 of the normalized text, plus a
    * compact 64-bit fingerprint (first 16 hex chars). Normalization
    * makes the fingerprint whitespace/case-insensitive.
    */
  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val sha = sha2(normalizeText(col(textCol)), 256)
    df.withColumn("content_sha", sha)
      .withColumn("fp64", substring(sha, 1, 16))
  }

  /** Rolling-hash (Karp-Rabin flavored) shingle fingerprints: the
    * xxhash64 of each character n-gram window over the normalized text,
    * distinct per document. The basis for MinHash (graft.dedup.Dedup).
    * Array column `shingle_hashes: array<bigint>`.
    *
    * PERFORMANCE: `c` is referenced INSIDE the transform lambda, so any
    * expression passed here re-evaluates once per window. Pass a plain
    * (pre-projected) column — use [[shingleHashesNormalized]] after
    * projecting [[normalizeText]] into its own column; this convenience
    * wrapper is fine only for one-off/small inputs.
    */
  def shingleHashes(c: Column, n: Int): Column =
    shingleHashesNormalized(normalizeText(c), n)

  /** [[shingleHashes]] over already-normalized text. */
  def shingleHashesNormalized(norm: Column, n: Int): Column = {
    val count = length(norm) - (n - 1)
    // sequence(1, 0) would yield a DESCENDING [1, 0] — guard short texts.
    when(count >= 1,
      array_distinct(
        transform(sequence(lit(1), count), i => xxhash64(norm.substr(i, lit(n))))))
      .otherwise(array().cast("array<bigint>"))
  }
}
