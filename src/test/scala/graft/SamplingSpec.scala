package graft

import graft.sample.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")

  test("sampleByKey: deterministic, parallelism-invariant, rate-accurate") {
    val a = Sampling.sampleByKey(docs, "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.sampleByKey(docs.repartition(13), "doc_id", 0.3)
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b) // same rows at any partitioning
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.1) // within binomial noise at n=500
    // nested property: a lower rate selects a SUBSET of a higher rate
    // (bucket < threshold is monotone in the threshold)
    val low = Sampling.sampleByKey(docs, "doc_id", 0.1)
      .select($"doc_id").as[Long].collect().toSet
    assert(low.subsetOf(a))
  }

  test("stratified: per-stratum rates applied, unlisted strata kept at default") {
    val out = Sampling.stratified(docs, "doc_id", "lang",
        rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 1.0)
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val full = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // unlisted strata fully kept
    Seq("de", "es", "fr").foreach(l => assert(out(l) === full(l)))
    // listed strata downsampled near their rate
    assert(math.abs(out("en").toDouble / full("en") - 0.25) < 0.15)
    assert(math.abs(out("zh").toDouble / full("zh") - 0.5) < 0.2)
    // different seed → different selection, same determinism
    val reseeded = Sampling.stratified(docs, "doc_id", "lang",
        rates = Map("en" -> 0.25), seed = 7L)
      .select($"doc_id").as[Long].collect().toSet
    val original = Sampling.stratified(docs, "doc_id", "lang",
        rates = Map("en" -> 0.25), seed = 42L)
      .select($"doc_id").as[Long].collect().toSet
    assert(reseeded !== original)
    assertThrows[IllegalArgumentException] {
      Sampling.stratified(docs, "doc_id", "lang", rates = Map("en" -> 1.5))
    }
  }

  test("null keys get a deterministic decision; rate 1.0 keeps every row") {
    val df = Seq((java.lang.Long.valueOf(1L), "en"),
      (null.asInstanceOf[java.lang.Long], "en")).toDF("id", "lang")
    // rate 1.0 → threshold = Buckets → every bucket (incl. the null
    // sentinel's) is below it; null rows must NOT silently vanish.
    assert(Sampling.sampleByKey(df, "id", 1.0).count() === 2)
    assert(Sampling.stratified(df, "id", "lang", rates = Map.empty,
      defaultRate = 1.0).count() === 2)
    // and the null-key decision is the same on rerun (deterministic)
    val k1 = Sampling.sampleByKey(df, "id", 0.5).count()
    val k2 = Sampling.sampleByKey(df, "id", 0.5).count()
    assert(k1 === k2)
  }

  test("reservoirPerGroup: exactly min(k, |group|) rows, parallelism-invariant") {
    val sample = Sampling.reservoirPerGroup(docs, "doc_id", "lang", k = 7)
    val perGroup = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.keySet === full.keySet) // no group lost
    perGroup.foreach { case (g, n) => assert(n === math.min(7L, full(g))) }
    // sample rows come from the input (same doc stays selected)
    assert(sample.join(docs, Seq("doc_id"), "left_anti").count() === 0)
    // identical selection at a different parallelism
    val repart = Sampling.reservoirPerGroup(
      docs.repartition(3), "doc_id", "lang", k = 7)
    val a = sample.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = repart.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("temperatureRates: closed form, alpha endpoints, no upsampling") {
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = full.values.min.toDouble

    // alpha = 1 → every rate exactly 1 (no-op)
    assert(Sampling.temperatureRates(docs, "lang", 1.0).values.forall(_ == 1.0))
    // alpha = 0 → r_g = n_min / n_g (uniform target)
    val r0 = Sampling.temperatureRates(docs, "lang", 0.0)
    full.foreach { case (g, n) => assert(math.abs(r0(g) - nMin / n) < 1e-12) }
    // general alpha: closed form, smallest group exactly 1, all ≤ 1
    val r = Sampling.temperatureRates(docs, "lang", 0.5)
    full.foreach { case (g, n) =>
      assert(math.abs(r(g) - math.pow(nMin / n, 0.5)) < 1e-12)
    }
    assert(r(full.minBy(_._2)._1) === 1.0)
    assert(r.values.forall(_ <= 1.0))
    assertThrows[IllegalArgumentException] {
      Sampling.temperatureRates(docs, "lang", 1.5)
    }
  }

  test("temperatureSample: smallest group fully kept; deterministic; expected mixture") {
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Sampling.temperatureSample(docs, "doc_id", "lang", alpha = 0.0)
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minGroup = full.minBy(_._2)._1
    assert(kept(minGroup) === full(minGroup)) // rate 1 → all rows survive
    // every group's kept count near the uniform target n_min
    val nMin = full.values.min.toDouble
    kept.foreach { case (_, n) =>
      assert(math.abs(n - nMin) < 4 * math.sqrt(nMin) + 1)
    }
    // parallelism-invariant (pure (key, seed) decision)
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(
        docs.repartition(11), "doc_id", "lang", alpha = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("selectByTokenBudget: equals the global-prefix reference; nBins-invariant") {
    import org.apache.spark.sql.expressions.Window
    val scored = docs.withColumn("score", (col("doc_id") % 97).cast("double"))
    val budget = 50000L

    // reference: naive global sort + running sum (the semantics)
    val wnd = Window
      .orderBy(col("score").desc, Sampling.bucket(col("doc_id"), 42L), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = scored
      .withColumn("cum", sum(col("n_chars").cast("long")).over(wnd))
      .where(col("cum") <= budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expect.nonEmpty && expect.size < docs.count())

    val got = Sampling.selectByTokenBudget(
        scored, "doc_id", "n_chars", "score", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expect)

    // bin count must not change the selection (incl. the degenerate
    // nBins=1 case where everything is boundary)
    Seq(1, 7, 5000).foreach { bins =>
      val alt = Sampling.selectByTokenBudget(
          scored, "doc_id", "n_chars", "score", budget, nBins = bins)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(alt === expect, s"nBins=$bins")
    }
    // parallelism-invariant
    val rep = Sampling.selectByTokenBudget(
        scored.repartition(13), "doc_id", "n_chars", "score", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rep === expect)
  }

  test("stratified: broadcast-join path selects the identical rows as the when-chain") {
    val rates = Map("en" -> 0.25, "zh" -> 0.5, "de" -> 0.8)
    val viaChain = Sampling.stratified(docs, "doc_id", "lang", rates,
        defaultRate = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaJoin = Sampling.stratified(docs, "doc_id", "lang", rates,
        defaultRate = 0.9, seed = 42L, whenChainMaxStrata = 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaJoin === viaChain)
    // join path keeps the input columns (no leaked join helpers)
    val out = Sampling.stratified(docs, "doc_id", "lang", rates,
      defaultRate = 0.9, seed = 42L, whenChainMaxStrata = 0)
    assert(out.columns.toSeq === docs.columns.toSeq)
    // null-stratum rows keep the default rate on the join path too
    val withNull = docs.withColumn("lang",
      when(col("doc_id") % 3 === 0, col("lang")))
    val nc = Sampling.stratified(withNull, "doc_id", "lang", rates,
        defaultRate = 1.0, seed = 42L, whenChainMaxStrata = 0)
      .where(col("lang").isNull).count()
    assert(nc === withNull.where(col("lang").isNull).count())
    // misconfigured rates rejected on the join path as well
    assertThrows[IllegalArgumentException] {
      Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 1.5),
        whenChainMaxStrata = 0)
    }
  }

  test("stratified: non-string strata match on canonical string form, identically on both paths") {
    // An int stratum 5 matches the rate key "5" — and NOT "5.0" — on
    // the when-chain exactly like on the join path, so a rate map
    // growing past the join threshold can never flip the selection.
    val df = spark.range(1000).select(col("id"),
      pmod(col("id"), lit(7L)).as("g"))
    def kept(rates: Map[String, Double], maxChain: Int): Set[Long] =
      Sampling.stratified(df, "id", "g", rates, defaultRate = 1.0,
          seed = 42L, whenChainMaxStrata = maxChain)
        .select("id").collect().map(_.getLong(0)).toSet
    val canonical = Map("5" -> 0.0) // drop stratum 5 entirely
    val chainSel = kept(canonical, Int.MaxValue)
    val joinSel = kept(canonical, 0)
    assert(chainSel === joinSel)
    assert(df.where(pmod(col("id"), lit(7L)) === 5).count() ===
      1000L - chainSel.size) // exactly stratum 5 dropped
    // a non-canonical key matches nothing on either path
    assert(kept(Map("5.0" -> 0.0), Int.MaxValue).size === 1000)
    assert(kept(Map("5.0" -> 0.0), 0).size === 1000)
  }

  test("stratified: 100k-strata rate table runs via the join path (bounded plan)") {
    // The when-chain equivalent of this rate table would be a 100k-arm
    // nested CASE — a Janino/plan-size failure class. The join path
    // compiles it as broadcast DATA. Selection is checked against an
    // INDEPENDENT arithmetic derivation of the same thresholds.
    val n = 100000
    val rates = (0 until n).map(i => s"s$i" -> ((i % 10) / 10.0)).toMap
    val df = spark.range(20000).select(col("id"),
      concat(lit("s"), pmod(col("id"), lit(997L))).as("g"))
    val got = Sampling.stratified(df, "id", "g", rates, defaultRate = 1.0)
      .select("id").collect().map(_.getLong(0)).toSet
    // rate of stratum s_i is (i%10)/10 with i = id%997 — same IEEE
    // double, same round-half-up threshold, derived without the map
    val thr = round((pmod(pmod(col("id"), lit(997L)), lit(10L)).cast("double")
      / 10.0) * 1000000).cast("long")
    val expect = df.where(Sampling.bucket(col("id"), 42L) < thr)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.nonEmpty && got.size < 20000)
  }

  test("temperatureSampleDistributed: identical selection to the collected-rates path") {
    Seq(0.0, 0.3, 1.0).foreach { alpha =>
      val a = Sampling.temperatureSample(docs, "doc_id", "lang", alpha)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val b = Sampling.temperatureSampleDistributed(docs, "doc_id", "lang", alpha)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(a === b, s"alpha=$alpha")
    }
    // null-group rows are kept on both paths
    val withNull = docs.withColumn("lang",
      when(col("doc_id") % 5 =!= 0, col("lang")))
    val kept = Sampling.temperatureSampleDistributed(
        withNull, "doc_id", "lang", alpha = 0.0)
      .where(col("lang").isNull).count()
    assert(kept === withNull.where(col("lang").isNull).count())
    // no leaked helper columns
    assert(Sampling.temperatureSampleDistributed(docs, "doc_id", "lang", 0.5)
      .columns.toSeq === docs.columns.toSeq)
  }

  test("selectByTokenBudget: edge cases — zero budget, all-fits, null score/weight") {
    val scored = docs.withColumn("score", col("n_chars").cast("double"))
    assert(Sampling.selectByTokenBudget(
      scored, "doc_id", "n_chars", "score", budget = 0L).count() === 0)
    val total = scored.agg(sum(col("n_chars").cast("long"))).first().getLong(0)
    assert(Sampling.selectByTokenBudget(
      scored, "doc_id", "n_chars", "score", budget = total).count() ===
      scored.count())
    // null score rows are never selected
    val withNulls = scored.withColumn("score",
      when(col("doc_id") % 2 === 0, col("score")))
    val sel = Sampling.selectByTokenBudget(
      withNulls, "doc_id", "n_chars", "score", budget = total)
    assert(sel.where(col("doc_id") % 2 =!= 0).count() === 0)
    assert(sel.count() === withNulls.where(col("doc_id") % 2 === 0).count())

    // non-finite scores are excluded like nulls — a NaN max would
    // poison every bin width; must neither crash nor be selected
    val poisoned = scored.withColumn("score",
      when(col("doc_id") % 10 === 0, lit(Double.NaN))
        .when(col("doc_id") % 10 === 1, lit(Double.PositiveInfinity))
        .when(col("doc_id") % 10 === 2, lit(Double.NegativeInfinity))
        .otherwise(col("score")))
    val psel = Sampling.selectByTokenBudget(
      poisoned, "doc_id", "n_chars", "score", budget = 30000L)
    assert(psel.where(col("doc_id") % 10 <= 2).count() === 0)
    assert(psel.count() > 0)
  }
}
