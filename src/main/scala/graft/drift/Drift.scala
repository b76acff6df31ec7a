package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection per partition (north rule: KS/PSI per
  * `lang` against a baseline sketch).
  *
  * Everything is built-in bin-aggregate + join + window arithmetic — no
  * UDAF (SURVEY.md §2g): histograms shrink the data to
  * O(groups × nBins) rows before any join or window runs, so the only
  * full-data pass is one map-side-combined groupBy per side.
  */
object Drift {

  /** Fixed-width histogram of `valueCol` over [lo, hi): one row per
    * (…groupCols, bin) with count `n`. Out-of-range values clamp into
    * the edge bins; nulls are excluded.
    */
  def bins(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      nBins: Int,
      lo: Double,
      hi: Double
  ): DataFrame = {
    val width = (hi - lo) / nBins
    val raw = floor((col(valueCol).cast("double") - lo) / width)
    val bin = least(greatest(raw, lit(0d)), lit((nBins - 1).toDouble))
      .cast("long")
      .as("bin")
    df.where(col(valueCol).isNotNull)
      .groupBy((groupCols.map(col) :+ bin): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Interior bin edges derived from the BASELINE's quantiles —
    * auto-binning for [[compareWithEdges]]: `nBins − 1` edges at
    * i/nBins for i = 1..nBins−1, so baseline mass is ~equal per bin
    * (the equal-width foot-gun — a mis-chosen [lo, hi) cramming the
    * real mass into two edge bins — disappears, and at 100 TB nobody
    * has to run a separate min/max pass to find ranges). `exact = false`
    * uses the approx_percentile sketch (the scale path); callers that
    * must replay the binning in an external oracle use `exact = true`
    * (same type-7 interpolation as DuckDB `quantile_cont` — pinned by
    * StatsSpec/`q_quantiles_lineitem`).
    */
  def quantileEdges(
      base: DataFrame,
      valueCol: String,
      nBins: Int,
      exact: Boolean = false): Array[Double] = {
    require(nBins >= 2, s"auto-binning needs nBins >= 2, got $nBins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    graft.stats.ColumnStats.quantiles(
        base.where(col(valueCol).isNotNull), valueCol, Nil, qs, exact)
      .orderBy(col("q"))
      .collect()
      .map(r => r.getDouble(1))
  }

  /** Histogram over EXPLICIT ascending edges: bin(v) = number of edges
    * ≤ v, i.e. bin 0 = (-inf, e0), bin i = [e_{i−1}, e_i), last bin =
    * [e_last, +inf) — every value lands in exactly one of
    * `edges.length + 1` bins with no clamping. Plain integer adds
    * (codegen'd), no higher-order functions.
    */
  def binsByEdges(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      edges: Array[Double]): DataFrame = {
    require(edges.nonEmpty && edges.sameElements(edges.sorted),
      "edges must be non-empty and ascending")
    val v = col(valueCol).cast("double")
    val bin = edges.foldLeft(lit(0L)) { (acc, e) =>
      acc + when(v >= e, 1L).otherwise(0L)
    }.as("bin")
    df.where(col(valueCol).isNotNull)
      .groupBy((groupCols.map(col) :+ bin): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** PSI + KS over an explicit edge set (see [[binsByEdges]]). */
  def compareWithEdges(
      cur: DataFrame,
      base: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      edges: Array[Double],
      eps: Double = 1e-6): DataFrame = {
    val c = binsByEdges(cur, valueCol, groupCols, edges)
      .withColumnRenamed("n", "n_cur")
    val b = binsByEdges(base, valueCol, groupCols, edges)
      .withColumnRenamed("n", "n_base")
    scoreBins(c.join(b, groupCols :+ "bin", "full_outer"), groupCols, eps)
  }

  /** [[compare]] with AUTO-derived binning: edges come from the
    * baseline's own quantiles ([[quantileEdges]]) instead of caller
    * `lo`/`hi`/width guesses.
    */
  def compareAuto(
      cur: DataFrame,
      base: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      nBins: Int,
      exact: Boolean = false,
      eps: Double = 1e-6): DataFrame =
    compareWithEdges(cur, base, valueCol, groupCols,
      quantileEdges(base, valueCol, nBins, exact), eps)

  /** The persistable baseline sketch: per-(group, bin) counts. O(groups
    * × nBins) rows — write it once per baseline snapshot
    * (`sketch(df,…).write.parquet(…)`), then score any later snapshot
    * against it WITHOUT rescanning the baseline data via
    * [[compareWithBaseline]]. Binning parameters must match between
    * sketch and compare (callers persist them alongside, cf.
    * ValidationRun metrics).
    */
  def sketch(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      nBins: Int,
      lo: Double,
      hi: Double): DataFrame =
    bins(df, valueCol, groupCols, nBins, lo, hi)

  /** PSI/KS of `cur` against a materialized EDGE-binned baseline
    * sketch (the output of [[binsByEdges]] read back from storage, cf.
    * `IndexStore.buildDriftBaseline`). Only `cur` is scanned; the
    * sketch side is O(groups × bins). The edges must be the ones the
    * sketch was built with — the store's meta sidecar carries them.
    */
  def compareWithBaselineEdges(
      cur: DataFrame,
      baselineSketch: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      edges: Array[Double],
      eps: Double = 1e-6): DataFrame = {
    val c = binsByEdges(cur, valueCol, groupCols, edges)
      .withColumnRenamed("n", "n_cur")
    val b = baselineSketch.withColumnRenamed("n", "n_base")
    scoreBins(c.join(b, groupCols :+ "bin", "full_outer"), groupCols, eps)
  }

  /** PSI/KS of `cur` against an already-materialized baseline sketch
    * (the output of [[sketch]], typically read back from parquet).
    * Only `cur` is scanned; the sketch side is O(groups × nBins).
    */
  def compareWithBaseline(
      cur: DataFrame,
      baselineSketch: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      nBins: Int,
      lo: Double,
      hi: Double,
      eps: Double = 1e-6): DataFrame = {
    val c = bins(cur, valueCol, groupCols, nBins, lo, hi)
      .withColumnRenamed("n", "n_cur")
    val b = baselineSketch.withColumnRenamed("n", "n_base")
    scoreBins(c.join(b, groupCols :+ "bin", "full_outer"), groupCols, eps)
  }

  /** PSI + KS per group between `cur` and `base` over a shared binning.
    * Output: `(…groupCols, n_cur, n_base, psi, ks)` with
    * PSI = Σ (p−q)·ln(p/q) (eps-floored fractions) and
    * KS = max |CDF_cur − CDF_base| at bin boundaries. Both rounded to 6
    * decimals (stable across aggregation orders).
    */
  def compare(
      cur: DataFrame,
      base: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      nBins: Int,
      lo: Double,
      hi: Double,
      eps: Double = 1e-6
  ): DataFrame = {
    val c = bins(cur, valueCol, groupCols, nBins, lo, hi)
      .withColumnRenamed("n", "n_cur")
    val b = bins(base, valueCol, groupCols, nBins, lo, hi)
      .withColumnRenamed("n", "n_base")
    scoreBins(c.join(b, groupCols :+ "bin", "full_outer"), groupCols, eps)
  }

  /** Drift of each group's distribution against the GLOBAL distribution
    * of the same frame — the per-`lang`-vs-baseline shape when no
    * separate baseline snapshot exists. The global histogram is tiny
    * (nBins rows) and broadcast.
    */
  def againstGlobal(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      nBins: Int,
      lo: Double,
      hi: Double,
      eps: Double = 1e-6
  ): DataFrame = {
    val c = bins(df, valueCol, groupCols, nBins, lo, hi)
      .withColumnRenamed("n", "n_cur")
    val b = bins(df, valueCol, Nil, nBins, lo, hi)
      .withColumnRenamed("n", "n_base")
    // Densify to the full (group × global-bin) grid: a bin the group
    // never hit still contributes a PSI term (p=eps, q>0) and a CDF
    // step. Groups = those with ≥1 binned row; grid is
    // O(groups × nBins) rows, built from already-aggregated frames.
    val groups = c.select(groupCols.map(col): _*).distinct()
    val grid = groups.crossJoin(broadcast(b))
    val joined = grid
      .join(c, groupCols :+ "bin", "left_outer")
      .na.fill(0L, Seq("n_cur"))
    scoreBins(joined, groupCols, eps)
  }

  /** Categorical drift: PSI + total-variation distance of a CATEGORY
    * distribution (lang, source, file extension, …) between `cur` and
    * `base` — the columns numeric binning can't cover. Output:
    * `(…groupCols, n_cur, n_base, psi, tv)` with
    * TV = ½·Σ|p−q| ∈ [0,1] (KS is meaningless for unordered
    * categories, so TV replaces it). Costs one map-side-combined
    * groupBy per side; categories never leave the executors until
    * reduced to O(groups × categories) rows.
    */
  def categoricalCompare(
      cur: DataFrame,
      base: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      eps: Double = 1e-6): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.where(col(valueCol).isNotNull)
        .groupBy((groupCols.map(col) :+ col(valueCol).cast("string").as("category")): _*)
        .agg(count(lit(1)).as(as))
    val joined = counts(cur, "n_cur")
      .join(counts(base, "n_base"), groupCols :+ "category", "full_outer")
      .na.fill(0L, Seq("n_cur", "n_base"))
    val g = groupCols.map(col)
    val wg = Window.partitionBy(g: _*)
    val p = col("n_cur") / sum(col("n_cur")).over(wg)
    val q = col("n_base") / sum(col("n_base")).over(wg)
    val pc = greatest(p, lit(eps))
    val qc = greatest(q, lit(eps))
    joined
      .withColumn("p", p)
      .withColumn("q", q)
      .withColumn("psi_term", (pc - qc) * log(pc / qc))
      .groupBy(g: _*)
      .agg(
        sum(col("n_cur")).as("n_cur"),
        sum(col("n_base")).as("n_base"),
        round(sum(col("psi_term")), 6).as("psi"),
        round(sum(abs(col("p") - col("q"))) / 2d, 6).as("tv"))
  }

  /** Shared scoring over joined per-bin counts. Operates on
    * O(groups × nBins) rows — window use here is cheap by construction.
    */
  private def scoreBins(
      joined: DataFrame,
      groupCols: Seq[String],
      eps: Double
  ): DataFrame = {
    val g = groupCols.map(col)
    val wg = Window.partitionBy(g: _*)
    val wcum = wg
      .orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = joined.na.fill(0L, Seq("n_cur", "n_base"))
    val p = col("n_cur") / sum(col("n_cur")).over(wg)
    val q = col("n_base") / sum(col("n_base")).over(wg)
    val pc = greatest(p, lit(eps))
    val qc = greatest(q, lit(eps))

    filled
      .withColumn("p", p)
      .withColumn("q", q)
      .withColumn("psi_term", (pc - qc) * log(pc / qc))
      .withColumn("cdf_p", sum(col("p")).over(wcum))
      .withColumn("cdf_q", sum(col("q")).over(wcum))
      .groupBy(g: _*)
      .agg(
        sum(col("n_cur")).as("n_cur"),
        sum(col("n_base")).as("n_base"),
        round(sum(col("psi_term")), 6).as("psi"),
        round(max(abs(col("cdf_p") - col("cdf_q"))), 6).as("ks")
      )
  }
}
