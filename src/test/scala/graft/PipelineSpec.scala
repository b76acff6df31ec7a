package graft

import graft.pipeline.CorpusPipeline
import graft.schema.{FieldSpec, Schema}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")

  private val cfg = CorpusPipeline.Config(
    schema = Schema.of(
      "text" -> FieldSpec(required = true, notEmpty = true),
      "lang" -> FieldSpec(required = true,
        allowed = Some(Seq("de", "en", "es", "fr", "zh")))),
    qualityMin = 0.5,
    sampleRates = Map("en" -> 0.5))

  test("curation funnel: monotone stage counts, curated output consistent with metrics") {
    val m = CorpusPipeline.metrics(docs, cfg).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("0_input") === docs.count())
    // each filtering stage can only shrink the corpus
    assert(m("1_validated") <= m("0_input"))
    assert(m("2_deduped") <= m("1_validated"))
    assert(m("3_quality") <= m("2_deduped"))
    assert(m("4_sampled") <= m("3_quality"))
    assert(m("4_sampled") > 0)
    assert(m("5_packs") > 0 && m("5_packs") <= m("4_sampled"))

    val curated = CorpusPipeline.curate(docs, cfg)
    assert(curated.count() === m("4_sampled"))
    // curated rows carry quality + pack assignment and are real inputs
    assert(curated.columns.contains("quality"))
    assert(curated.columns.contains("pack_id"))
    assert(curated.agg(min($"quality")).head().getDouble(0) >= 0.5)
    val ids = curated.select($"doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(all))
    // deterministic end to end
    val again = CorpusPipeline.curate(docs, cfg)
      .select($"doc_id", $"pack_bucket", $"pack_id")
      .as[(Long, Int, Long)].collect().toSet
    val first = curated.select($"doc_id", $"pack_bucket", $"pack_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(first === again)
  }
}
