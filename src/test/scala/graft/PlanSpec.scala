package graft

import graft.refint.RefIntegrity
import graft.sim.Similarity
import graft.validate.Validator
import graft.verdict.Verdict
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Plan-SHAPE regression tests: the scale-critical physical-plan
  * properties the dossier (PLANS.md) documents, asserted so they cannot
  * silently regress. These inspect the pre-adaptive physical plan —
  * shape, not timings, so they are deterministic at any data size.
  */
class PlanSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  /** Final physical plan with exchanges inserted (EnsureRequirements
    * runs in executedPlan, not sparkPlan); AQE is disabled for the
    * planning call so the plan is a plain inspectable tree instead of
    * an AdaptiveSparkPlan wrapper.
    */
  private def physical(df: DataFrame): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] =
    physical(df).collect { case s: ShuffleExchangeExec => s }

  private val docSchema = graft.schema.Schema.of(
    "text" -> graft.schema.FieldSpec(required = true, minLength = Some(10)),
    "lang" -> graft.schema.FieldSpec(allowed = Some(Seq("en", "de"))))

  test("per-row validation is shuffle-free (pure projection)") {
    assert(shuffles(Validator.annotate(docs, docSchema)).isEmpty)
    assert(shuffles(Validator.violations(docs, docSchema, Seq("doc_id"))).isEmpty)
  }

  test("verdict rollup is one exchange with map-side partial aggregation") {
    val v = Verdict.compute(docs, docSchema, "lang")
    assert(shuffles(v).length === 1)
    assert(physical(v).toString.contains("partial_"))
  }

  test("ruleBreakdown sketch path: ONE exchange (exact distinct needs two), no Expand") {
    // Exact countDistinct plans the two-exchange distinct-rewrite over
    // the violation rows; the HLL path must collapse to ONE partial/
    // final aggregation exchange. (Both paths stay SortAggregate — the
    // string example_min/max buffers are not hash-aggregable — but the
    // sort keys are O(rules) and the second corpus-keyed exchange is
    // the cost that matters at scale.)
    val exact2 = Verdict.ruleBreakdown(docs, docSchema)
    assert(shuffles(exact2).length === 2)
    val sketch = Verdict.ruleBreakdown(docs, docSchema, approxDistinct = true)
    assert(shuffles(sketch).length === 1)
    val p = physical(sketch).toString
    assert(!p.contains("Expand"))
    assert(p.contains("partial_"))
    // and it must agree with the exact path on everything but the
    // distinct estimate (tiny violation sets: HLL is exact here too)
    val exact = Verdict.ruleBreakdown(docs, docSchema).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val approx = sketch.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(exact === approx)
  }

  test("relative expectations: current side is one aggregation; lookup joins are broadcast") {
    import graft.verdict.Expectations
    import graft.verdict.Expectations.Expect
    val baseline = Expectations.evaluate(docs,
      Seq(Expect("row_count"), Expect("mean", "n_chars")), Seq("lang"))
    val rel = Expectations.evaluateRelative(docs,
      Seq(Expect("row_count_rel", lo = 0.5, hi = 2.0),
        Expect("mean_rel", "n_chars", lo = 0.5, hi = 2.0)),
      baseline, Seq("lang"))
    val p = physical(rel)
    // corpus-keyed exchanges: one per evaluate() pass (current +
    // baseline) — the alignment/bounds joins must add none beyond the
    // full-outer's own requirement, and the bounds join is broadcast.
    assert(p.toString.contains("BroadcastHashJoin"))
    assert(physical(rel).toString.contains("partial_"))
  }

  test("referential integrity plans a broadcast LEFT ANTI join") {
    val dim = spark.range(10).select(col("id").as("doc_id"))
    val p = physical(RefIntegrity.summary(docs, dim, Seq("doc_id"))).toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
  }

  test("stratified join path: plan size is O(1) in the rate-table cardinality") {
    import graft.sample.Sampling
    // The rate table is broadcast DATA, not plan literals: growing it
    // 100× must not change the optimized plan's node count (the
    // when-chain path grows one CASE arm per stratum — the IVF-literal
    // failure class the join path exists to avoid).
    val df = docs.withColumn("g", concat(lit("s"), pmod(col("doc_id"), lit(997L))))
    def nodes(nStrata: Int): Int = {
      val rates = (0 until nStrata).map(i => s"s$i" -> 0.5).toMap
      Sampling.stratified(df, "doc_id", "g", rates, defaultRate = 1.0,
          seed = 42L, whenChainMaxStrata = 0)
        .queryExecution.optimizedPlan.collect { case p => p }.size
    }
    assert(nodes(200) === nodes(20000))
    // and the small-map when-chain path stays join-free (pure filter)
    val chain = Sampling.stratified(docs, "doc_id", "lang",
      Map("en" -> 0.5), defaultRate = 1.0)
    assert(shuffles(chain).isEmpty)
    assert(!physical(chain).toString.contains("Join"))
  }

  test("co-bucketed tables sort-merge join with zero exchanges and zero sorts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-bucket").toString
    // repartition by the bucket key first → ONE file per bucket, which
    // is what lets the scan vouch for within-bucket sortedness
    val left = spark.range(1000).select(
      (col("id") % 41).as("k"), col("id").as("a")).repartition(8, col("k"))
    val right = spark.range(300).select(
      (col("id") % 41).as("k"), col("id").as("b")).repartition(8, col("k"))
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      graft.sources.TableIO.writeBucketed(left, "plan_bl", s"$dir/l", Seq("k"), 8, Seq("k"))
      graft.sources.TableIO.writeBucketed(right, "plan_br", s"$dir/r", Seq("k"), 8, Seq("k"))
      // force the sort-merge path (tiny test tables would broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("plan_bl").join(spark.table("plan_br"), Seq("k"))
      val p = physical(j)
      assert(p.toString.contains("SortMergeJoin"))
      assert(shuffles(j).isEmpty, "co-bucketed join must not exchange either side")
      assert(p.toString.contains("Bucketed: true"))
      // with the write-time sortBy honored (off by default since
      // SPARK-28632 — one file per bucket required), the per-task
      // sorts disappear too
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val p2 = physical(spark.table("plan_bl").join(spark.table("plan_br"), Seq("k")))
      assert(p2.collect { case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        "bucket-sorted tables must not re-sort for the join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS plan_bl")
      spark.sql("DROP TABLE IF EXISTS plan_br")
    }
  }

  test("approximate bloom RI is a shuffle-free scan; exact path joins only probe-hits") {
    val dim = docs.select(col("doc_id")).limit(100)
    val bloom = RefIntegrity.buildKeyBloom(dim, Seq("doc_id"), 1000L)
    // probe-only path: one codegen'd filter over the fact scan, no
    // exchange, no dim access
    assert(shuffles(RefIntegrity.orphansApprox(docs, Seq("doc_id"), bloom)).isEmpty)
    // exact path: the bloom probe appears as a pushed filter on the
    // candidate branch (might_contain_long in the plan), not a UDF
    val p = physical(RefIntegrity.orphansWithBloom(
      docs, dim, Seq("doc_id"), bloom, broadcastDim = true)).toString
    assert(p.contains("might_contain_long"))
  }

  test("column pruning reaches the scan for narrow projections") {
    val q = docs.select(col("doc_id"), length(col("text")).as("len"))
    val scans = physical(q).toString
    assert(scans.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("filter pushdown reaches the parquet scan") {
    val q = docs.where(col("lang") === "en").select(col("doc_id"))
    assert(physical(q).toString.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"))
  }

  test("minhash/simhash signature plans are shuffle-free (native single projection)") {
    assert(shuffles(graft.dedup.Dedup.minHashSignatures(docs, "doc_id", "text")).isEmpty)
    assert(shuffles(graft.dedup.Dedup.simHash(docs, "doc_id", "text")).isEmpty)
  }

  test("LSH pair-mining shuffles carry scalar columns only, never embedding vectors") {
    val pairs = Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
      dim = 64, minCosine = 0.4, nPlanes = 6, nTables = 4)
    val topk = Similarity.annTopK(emb, emb.where(col("vec_id") < 5), "vec_id",
      "embedding", dim = 64, k = 5, nPlanes = 4, nTables = 4)
    Seq(pairs, topk).foreach { df =>
      val ex = shuffles(df)
      assert(ex.nonEmpty)
      ex.foreach { s =>
        val arrayCols = s.child.output.filter(_.dataType.isInstanceOf[ArrayType])
        assert(arrayCols.isEmpty,
          s"shuffle carries array columns: ${arrayCols.map(_.name).mkString(",")}")
      }
    }
  }

  test("brute-force top-k broadcasts the query side and partially limits per partition") {
    val p = physical(Similarity.bruteForceTopK(
      emb, emb.where(col("vec_id") < 5), "vec_id", "embedding", k = 5)).toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit"))
  }
}
