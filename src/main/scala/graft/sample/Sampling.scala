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

  /** Strata count above which [[stratified]] compiles the rate table as
    * a broadcast-joined frame instead of [[stratifiedKeep]]'s literal
    * when-chain. Below it the when-chain wins (no join node, pure
    * codegen'd filter); above it the when-chain is a plan-size /
    * Janino-compile failure class — each stratum adds a nested CASE arm,
    * so a high-cardinality group column (domains, source buckets:
    * 10⁴–10⁶ strata) grows the plan linearly until codegen breaks (the
    * same per-literal problem the IVF centroid expression was built to
    * avoid). The join path's plan is O(1) in |rates| (pinned by
    * PlanSpec): the rate table is DATA on a broadcast side, not plan
    * literals.
    */
  val WhenChainMaxStrata = 128

  /** Stratified sampling: per-stratum keep rates (e.g. downsample
    * over-represented languages), `defaultRate` for unlisted strata.
    * Identical selection on either path (pinned by SamplingSpec):
    * ≤ `whenChainMaxStrata` strata compile to one codegen'd filter (no
    * shuffle, no join); above that the rates become a broadcast-joined
    * `(stratum, threshold)` frame — still no corpus shuffle (broadcast
    * hash join + filter), and the plan stays O(1) in |rates|. Rows
    * whose stratum is NULL or unlisted keep `defaultRate` on both
    * paths.
    */
  def stratified(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      seed: Long = 42L,
      whenChainMaxStrata: Int = WhenChainMaxStrata): DataFrame =
    if (rates.size <= whenChainMaxStrata)
      df.where(stratifiedKeep(keyCol, strataCol, rates, defaultRate, seed))
    else {
      requireRates(rates, defaultRate)
      val spark = df.sparkSession
      import spark.implicits._
      val thr = broadcast(
        rates.toSeq.map { case (stratum, r) => (stratum, threshold(r)) }
          .toDF("__stratum", "__thr"))
      df.join(thr, df(strataCol).cast("string") === thr("__stratum"), "left")
        .where(bucket(col(keyCol), seed) <
          coalesce(col("__thr"), lit(threshold(defaultRate))))
        .drop("__stratum", "__thr")
    }

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

  /** Temperature-based mixture rebalancing (the UniMax/mC4-style
    * language-balancing rule): per-group keep rates
    * `r_g = (n_min / n_g)^(1-alpha)`, so expected sampled counts are
    * proportional to `n_g^alpha`. `alpha = 1` keeps everything (no-op);
    * `alpha = 0` flattens to uniform (every group expected at the
    * smallest group's size). No group is ever upsampled — the smallest
    * group's rate is exactly 1 — so the sample stays a subset and the
    * selection stays a pure (key, seed) function.
    *
    * Scale: the rate derivation aggregates O(groups) counts to the
    * driver — bounded by GROUP cardinality, not data, but still a
    * driver-memory ceiling when the group column is high-cardinality
    * (10⁵⁺ domains). Use [[temperatureSampleDistributed]] there: same
    * selection, zero driver collect. Rows whose group is NULL are kept
    * (rate 1.0) — they are not a stratum to rebalance.
    */
  def temperatureRates(
      df: DataFrame,
      groupCol: String,
      alpha: Double): Map[String, Double] = {
    require(alpha >= 0d && alpha <= 1d, s"alpha must be in [0,1], got $alpha")
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string"))
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty) Map.empty
    else {
      val nMin = counts.map(_._2).min.toDouble
      counts.map { case (g, n) =>
        g -> math.pow(nMin / n, 1d - alpha)
      }.toMap
    }
  }

  /** [[temperatureRates]] applied: downsample over-represented groups
    * to the `n^alpha` mixture. Deterministic end-to-end — the rates are
    * a pure function of the group counts and the keep/drop decision a
    * pure function of (key, seed), so the oracle re-derives the
    * identical row set from the same table.
    */
  def temperatureSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      alpha: Double,
      seed: Long = 42L): DataFrame =
    stratified(df, keyCol, groupCol, temperatureRates(df, groupCol, alpha),
      defaultRate = 1.0, seed = seed)

  /** [[temperatureSample]] with the rate table kept DISTRIBUTED — the
    * high-cardinality-group path (per-domain rebalancing, 10⁵⁺ strata):
    * group counts, the global minimum, the `(n_min/n_g)^(1-alpha)`
    * rates, and their integer thresholds are all derived in-plan and
    * broadcast-joined back; nothing is ever collected to the driver.
    * Threshold arithmetic matches [[threshold]] exactly (`round`, both
    * HALF_UP for non-negative rates), so the selected row set is
    * IDENTICAL to [[temperatureSample]]'s at any group cardinality
    * (pinned by SamplingSpec). Cost: one O(groups) aggregate + a 1-row
    * cross join for the global min (the documented 1-row summary
    * pattern) + a broadcast join — the corpus still never shuffles.
    */
  def temperatureSampleDistributed(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      alpha: Double,
      seed: Long = 42L): DataFrame = {
    require(alpha >= 0d && alpha <= 1d, s"alpha must be in [0,1], got $alpha")
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__nmin"))
    val thr = broadcast(
      counts.crossJoin(nMin)
        .select(col("__g"),
          round(pow(col("__nmin").cast("double") / col("__n"), 1d - alpha)
            * Buckets).cast("long").as("__thr")))
    df.join(thr, df(groupCol).cast("string") === thr("__g"), "left")
      .where(bucket(col(keyCol), seed) < coalesce(col("__thr"), lit(Buckets)))
      .drop("__g", "__thr")
  }

  /** Quality-ranked corpus trimming to a global token budget: order
    * rows by (`scoreCol` DESC, md5 bucket, key) and keep the maximal
    * prefix whose cumulative `weightCol` stays ≤ `budget` — "take the
    * best N tokens", the standard final cut of a curation pipeline.
    *
    * A naive implementation is a GLOBAL sort + running sum — a total
    * order over the corpus, the one thing a 100 TB job must not do.
    * This one finds the score cutoff with a histogram instead:
    *   1. one agg for the score range, one hash-agg for per-bin token
    *      sums (O(nBins) rows to the driver — bounded);
    *   2. the driver walks bins best-first to find the boundary bin:
    *      every bin above it fits the budget entirely (kept with a
    *      plain filter — no sort), every bin below is cut;
    *   3. ONLY the boundary bin — expected corpus/nBins of the rows —
    *      pays the ordered prefix scan (single-partition window; its
    *      size is the documented cost knob: raise `nBins` to shrink
    *      it; degenerate all-equal-scores input puts everything in one
    *      bin, where the global sort is genuinely irreducible).
    *
    * Rows with NULL or non-finite (NaN/±Inf) score, or NULL weight, are
    * never selected — a NaN `hi` would poison every bin width into NaN
    * and crash the cutoff walk, so non-finite scores are excluded like
    * nulls rather than mid-job (E1 spirit: bad configuration must not
    * fail the run halfway). Weights must be non-negative (token counts)
    * and keys unique — the prefix rule is meaningless otherwise. Deterministic: identical selection at any
    * parallelism, rerun, or engine (the oracle replays the
    * global-prefix semantics directly with a window cumsum).
    *
    * The score is often a DERIVED expression (a regex-heavy quality
    * composite) far more expensive than the selection math, so all
    * cutoff passes run over a slim `(key, score, weight)` projection
    * cached ONCE in `scope` (the miners' caller-owned lifecycle —
    * release after consuming the result); the full-row emit then
    * evaluates the score exactly one more time (the kept-bins filter),
    * with boundary-bin survivors resolved on the slim frame and
    * semi-joined back by key (~corpus/nBins keys — AQE broadcasts).
    * Total: two evaluations of the score expression, regardless of
    * nBins or how many driver actions the cutoff needs.
    */
  def selectByTokenBudget(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      scoreCol: String,
      budget: Long,
      nBins: Int = 1000,
      seed: Long = 42L,
      scope: graft.util.CacheScope = graft.util.CacheScope.shared): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative, got $budget")
    require(nBins >= 1, s"nBins must be positive, got $nBins")
    val s0 = col(scoreCol).cast("double")
    val w = col(weightCol).cast("long")
    val eligible = df.where(s0.isNotNull && !isnan(s0) &&
      s0 =!= lit(Double.PositiveInfinity) &&
      s0 =!= lit(Double.NegativeInfinity) && w.isNotNull)
    val slim = scope.cache(eligible
      .select(col(keyCol).as("__k"), s0.as("__s"), w.as("__w")))
    val range = slim.agg(min(col("__s")), max(col("__s"))).first()
    if (range.isNullAt(0)) return eligible // empty input
    val (lo, hi) = (range.getDouble(0), range.getDouble(1))
    def binOf(c: Column): Column =
      if (hi == lo) lit(0)
      else least(floor((c - lit(lo)) / lit((hi - lo) / nBins)).cast("int"),
        lit(nBins - 1))

    val perBin = slim.groupBy(binOf(col("__s")).as("__bin"))
      .agg(sum(col("__w")).as("__wsum"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(-_._1)
    var cumAbove = 0L
    var boundary = Int.MinValue // sentinel: every bin fits
    perBin.foreach { case (bin, s) =>
      if (boundary == Int.MinValue) {
        if (cumAbove + s > budget) boundary = bin else cumAbove += s
      }
    }
    if (boundary == Int.MinValue) return eligible

    val wnd = org.apache.spark.sql.expressions.Window
      .orderBy(col("__s").desc, bucket(col("__k"), seed), col("__k"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val boundaryKeys = slim.where(binOf(col("__s")) === boundary)
      .withColumn("__cum", sum(col("__w")).over(wnd))
      .where(lit(cumAbove) + col("__cum") <= budget)
      .select(col("__k"))
    eligible.where(binOf(s0) > boundary)
      .unionByName(df.join(boundaryKeys, col(keyCol) === col("__k"), "left_semi"))
  }

  /** The stratified keep/drop DECISION as a boolean column — reusable
    * as a flag inside one-pass multi-stage aggregations (e.g. the
    * pipeline funnel), not just as a filter. This is the LITERAL
    * compilation: one when-arm per stratum, so it is for SMALL rate
    * maps only (languages, media kinds — the documented domain; see
    * [[WhenChainMaxStrata]]). High-cardinality rate tables must go
    * through [[stratified]], whose join path a Column cannot express.
    *
    * Strata match on the column value's CANONICAL STRING form (the
    * column is cast to string, compared to the rate key verbatim) —
    * the same comparison the join path uses, so the two compilations
    * can never select different rows. An int stratum 5 matches the
    * key "5", not "5.0"; numeric-coercion matching would hold only on
    * this path and silently flip when a growing rate map crosses the
    * join threshold.
    */
  def stratifiedKeep(
      keyCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      seed: Long = 42L): Column = {
    requireRates(rates, defaultRate)
    val rateCol = rates.foldLeft(lit(threshold(defaultRate))) {
      case (acc, (stratum, r)) =>
        when(col(strataCol).cast("string") === lit(stratum), lit(threshold(r)))
          .otherwise(acc)
    }
    bucket(col(keyCol), seed) < rateCol
  }

  private def requireRates(rates: Map[String, Double], defaultRate: Double): Unit =
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0d && r <= 1d, s"rates must be in [0,1], got $r"))
}
