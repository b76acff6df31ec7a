package graft.pipeline

import graft.compile.RuleCompiler
import graft.dedup.Dedup
import graft.pack.Packing
import graft.sample.Sampling
import graft.schema.Schema
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data user
  * actually runs, built ONLY from the engine's own operators:
  *
  *   1. validate  — keep rows with zero failing-channel violations
  *                  (warnings pass, cf. severity semantics);
  *   2. dedup     — exact content dedup, deterministic min-id survivor;
  *   3. quality   — composite quality score ≥ threshold;
  *   4. sample    — deterministic stratified downsampling per language;
  *   5. pack      — sequence packing into a token/char budget.
  *
  * Every stage is deterministic and engine-reproducible, so the whole
  * pipeline's per-stage row counts can be replayed exactly by the
  * DuckDB oracle (`q_pipeline_documents`) — the curation run is
  * auditable end to end, not a black box.
  *
  * At scale each stage is the operator's documented plan (no extra
  * shuffles added by the composition); a production run would persist
  * the stage boundaries it wants to audit/restart from (cf.
  * [[graft.resume.Checkpoint]]) rather than recompute the lineage per
  * metric, which is fine at test scale.
  */
object CorpusPipeline {

  final case class Config(
      schema: Schema,
      idCol: String = "doc_id",
      textCol: String = "text",
      strataCol: String = "lang",
      qualityMin: Double = 0.0,
      sampleRates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0,
      packBudget: Long = 2000L,
      packBuckets: Int = 16,
      seed: Long = 42L)

  /** The curated, pack-annotated corpus (one row per surviving doc with
    * `quality`, `pack_bucket`, `pack_id` columns).
    */
  def curate(docs: DataFrame, cfg: Config): DataFrame = {
    val clean = docs
      .withColumn("__n_err", RuleCompiler.errorCount(cfg.schema))
      .where(col("__n_err") === 0)
      .drop("__n_err")
    val deduped = Dedup.exactDedup(clean, cfg.idCol, cfg.textCol)
    val scored = TextAnalysis.qualityFeatures(deduped, cfg.textCol)
      .where(col("quality") >= cfg.qualityMin)
      .select(deduped.columns.map(col) :+ col("quality"): _*)
    val sampled = Sampling.stratified(scored, cfg.idCol, cfg.strataCol,
      cfg.sampleRates, cfg.defaultRate, cfg.seed)
    Packing.packByBudget(packable(sampled, cfg)
        .withColumn("__w", length(col(cfg.textCol))),
      cfg.idCol, "__w", cfg.packBudget, cfg.packBuckets, cfg.seed)
      .drop("__w")
  }

  /** The pack-input filter, applied identically by [[curate]] and
    * [[metrics]] stage 4 — packByBudget drops null-id / zero-weight
    * rows, and the audit funnel must count the SAME survivors the
    * curated output contains (for schemas whose rules already reject
    * null/empty text this filter is a no-op).
    */
  private def packable(df: DataFrame, cfg: Config): DataFrame =
    df.where(col(cfg.idCol).isNotNull && length(col(cfg.textCol)) > 0)

  /** Per-stage audit metrics: `(stage, n_rows)` for input / validated /
    * deduped / quality / sampled, plus the final pack count — the
    * auditable funnel a curation run reports.
    *
    * The post-dedup frame is the longest lineage prefix shared by four
    * of the six stage counts — it is persisted into `scope` (released
    * by the caller, cf. [[graft.util.CacheScope]]) so the validate +
    * dedup window runs once, not four times.
    */
  def metrics(
      docs: DataFrame,
      cfg: Config,
      scope: graft.util.CacheScope = graft.util.CacheScope.shared): DataFrame = {
    val clean = docs
      .withColumn("__n_err", RuleCompiler.errorCount(cfg.schema))
      .where(col("__n_err") === 0)
      .drop("__n_err")
    val deduped = scope.cache(Dedup.exactDedup(clean, cfg.idCol, cfg.textCol))
    val scored = TextAnalysis.qualityFeatures(deduped, cfg.textCol)
      .where(col("quality") >= cfg.qualityMin)
    val sampled = packable(
      Sampling.stratified(scored, cfg.idCol, cfg.strataCol,
        cfg.sampleRates, cfg.defaultRate, cfg.seed), cfg)
    val packed = Packing.packByBudget(sampled
        .withColumn("__w", length(col(cfg.textCol))),
      cfg.idCol, "__w", cfg.packBudget, cfg.packBuckets, cfg.seed)

    def stage(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("stage"), col("n_rows"))

    stage("0_input", docs)
      .unionByName(stage("1_validated", clean))
      .unionByName(stage("2_deduped", deduped))
      .unionByName(stage("3_quality", scored))
      .unionByName(stage("4_sampled", sampled))
      .unionByName(stage("5_packs",
        packed.select(col("pack_bucket"), col("pack_id")).distinct()))
  }
}
