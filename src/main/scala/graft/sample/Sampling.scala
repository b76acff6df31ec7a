package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Unlike `df.sample()` (RNG per partition — result depends on
  * partitioning and rerun), these samplers decide keep/drop as a PURE
  * function of the row key + seed, so:
  *   - reruns and different cluster sizes select the SAME rows
  *     (resume-safe — the checkpoint protocol can re-run a partition
  *     and get identical output);
  *   - the sample is reproducible in any other engine from the same
  *     key column (the DuckDB oracle recomputes it exactly);
  *   - adding rows never flips the decision on existing rows.
  *
  * The uniform hash is the first 8 hex chars of `md5(key || ':' || seed)`
  * mapped to a bucket in [0, 1e6) — plenty of resolution for per-mille
  * rates, and a pure codegen'd projection (no shuffle, no state).
  *
  * Semantics grounding: the reference's only sampling-flavored code is
  * seeded deterministic generation (SURVEY §2d F14); determinism-over-
  * RNG is the same design rule applied to selection.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Rate → bucket threshold; ROUNDED, not truncated — `(0.3 * 1e6)
    * .toLong` would be 299999 (binary representation of 0.3) and any
    * oracle computing the natural `round(rate * 1e6)` would select a
    * different row set.
    */
  private def threshold(rate: Double): Long = math.round(rate * Buckets)

  /** Uniform bucket in [0, 1e6) as a pure function of (key, seed).
    * Null keys hash the `__NULL_KEY__` sentinel (so they get a
    * deterministic decision like every other row, instead of being
    * silently dropped by null propagation through concat).
    */
  def bucket(key: Column, seed: Long): Column =
    conv(substring(md5(concat(
      coalesce(key.cast("string"), lit("__NULL_KEY__")),
      lit(":"), lit(seed))), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Keep each row with probability `rate`, decided by its key. */
  def sampleByKey(df: DataFrame, keyCol: String, rate: Double, seed: Long = 42L): DataFrame = {
    require(rate >= 0d && rate <= 1d, s"rate must be in [0,1], got $rate")
    df.where(bucket(col(keyCol), seed) < lit(threshold(rate)))
  }

  /** Stratified sampling: per-stratum keep rates (e.g. downsample
    * over-represented languages), `defaultRate` for unlisted strata.
    * One codegen'd filter — no shuffle, no per-stratum pass.
    */
  def stratified(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      seed: Long = 42L): DataFrame =
    df.where(stratifiedKeep(keyCol, strataCol, rates, defaultRate, seed))

  /** Exactly `min(k, |group|)` rows per group — the fixed-SIZE
    * counterpart to [[stratified]]'s fixed-RATE sampling (per-domain
    * caps, eval-set carving). Deterministic "reservoir": rows rank
    * within their group by the same md5 bucket the rate sampler uses
    * (tie-broken by the key itself — a total order when keys are
    * unique), and the top k survive. A pure function of
    * (key, group, seed): identical selection at any parallelism, any
    * rerun, any engine — the oracle replays it row-for-row.
    *
    * Scale: ONE shuffle on the group column; Catalyst plans the
    * rank-filter as `WindowGroupLimit`, so each input partition keeps
    * only its local top-k per group BEFORE the exchange — the shuffle
    * carries O(groups × k) rows per partition, not the corpus.
    */
  def reservoirPerGroup(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      k: Int,
      seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(bucket(col(keyCol), seed), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** The stratified keep/drop DECISION as a boolean column — reusable
    * as a flag inside one-pass multi-stage aggregations (e.g. the
    * pipeline funnel), not just as a filter.
    */
  def stratifiedKeep(
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      seed: Long = 42L): Column = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0d && r <= 1d, s"rates must be in [0,1], got $r"))
    val rateCol = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(threshold(r))).otherwise(acc)
    }
    bucket(col(keyCol), seed) < rateCol
  }
}
