package graft.pack

import graft.sample.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training data: group documents into packs
  * whose total weight (token count) targets a fixed `budget` — the
  * standard "pack documents into context windows" preparation step.
  *
  * Distributed design: a GLOBAL greedy packer is inherently sequential
  * (each decision depends on the running total), so the corpus is first
  * spread into `nBuckets` deterministic hash buckets and packing runs
  * independently INSIDE each bucket — one shuffle keyed by bucket, a
  * per-bucket window sort, and no cross-bucket coordination. This is
  * the same bucket-local approximation distributed packers use: pack
  * quality is unaffected for corpora ≫ nBuckets·budget, and wall time
  * scales with executors.
  *
  * Semantics (deterministic, engine-reproducible — the DuckDB oracle
  * recomputes it exactly): docs order by id inside their bucket; a doc
  * is assigned to pack `floor((cumsum - weight) / budget)` — i.e. the
  * pack where its span STARTS. A pack can therefore overflow its budget
  * by at most one document (documented first-fit-by-start semantics;
  * an exact reset-on-overflow greedy needs per-row recursion that
  * neither Catalyst nor SQL windows express).
  */
object Packing {

  /** Rows eligible for packing — the SAME filter everywhere (bucket
    * sizing must count exactly the rows the packer will see).
    */
  private def packable(df: DataFrame, idCol: String, weightCol: String): DataFrame =
    df.where(col(idCol).isNotNull &&
      col(weightCol).isNotNull && col(weightCol) > 0)

  /** Derive the bucket count from the data so per-bucket window sorts
    * stay BOUNDED at any input size: `ceil(packableRows /
    * targetRowsPerBucket)`, clamped to [1, 65536]. A fixed bucket
    * count makes each bucket one task sorting ~N/buckets of the corpus
    * — at 100 TB that is terabytes per task; deriving the count keeps
    * every sort ≤ targetRowsPerBucket rows regardless of scale. The
    * count() is metadata-cheap on parquet (no column reads), and the
    * derivation is a closed form over it, so an external oracle can
    * recompute the identical bucket count from the same table.
    */
  def autoBucketCount(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      targetRowsPerBucket: Long = 1L << 20): Int = {
    require(targetRowsPerBucket > 0,
      s"targetRowsPerBucket must be positive, got $targetRowsPerBucket")
    val n = packable(df, idCol, weightCol).count()
    val raw = (n + targetRowsPerBucket - 1) / targetRowsPerBucket
    math.max(1L, math.min(raw, 1L << 16)).toInt
  }

  /** [[packByBudget]] with the bucket count derived from the input size
    * ([[autoBucketCount]]) — the default at-scale entry point; the
    * explicit-`nBuckets` overload remains for callers that must pin the
    * layout (e.g. to replay a historical run).
    */
  def packByBudgetAuto(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      targetRowsPerBucket: Long = 1L << 20,
      seed: Long = 42L): DataFrame =
    packByBudget(df, idCol, weightCol, budget,
      autoBucketCount(df, idCol, weightCol, targetRowsPerBucket), seed)

  /** [[packSummary]] over [[packByBudgetAuto]]. */
  def packSummaryAuto(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      targetRowsPerBucket: Long = 1L << 20,
      seed: Long = 42L): DataFrame =
    packByBudgetAuto(df, idCol, weightCol, budget, targetRowsPerBucket, seed)
      .groupBy(col("pack_bucket"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(weightCol).cast("long")).as("total_weight"))

  /** Adds `pack_bucket` and `pack_id` to every row. Rows with null id
    * or null/≤0 weight are excluded (a doc with no tokens has no place
    * in a pack). `scopeCols` prefix the bucket key: packs then never
    * cross a scope (partition) — the semantics a per-partition
    * resumable pipeline needs, identical for any batching of scopes.
    */
  def packByBudget(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      nBuckets: Int = 64,
      seed: Long = 42L,
      scopeCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val w = Window
      .partitionBy(scopeCols.map(col) :+ col("pack_bucket"): _*)
      .orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packable(df, idCol, weightCol)
      .withColumn("pack_bucket",
        (Sampling.bucket(col(idCol), seed) % nBuckets).cast("int"))
      .withColumn("__cum", sum(col(weightCol).cast("long")).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(weightCol)) / budget).cast("long"))
      .drop("__cum")
  }

  /** One row per pack: `(pack_bucket, pack_id, n_docs, total_weight)` —
    * the audit view (fill rate, overflow accounting).
    */
  def packSummary(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      budget: Long,
      nBuckets: Int = 64,
      seed: Long = 42L): DataFrame =
    packByBudget(df, idCol, weightCol, budget, nBuckets, seed)
      .groupBy(col("pack_bucket"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(weightCol).cast("long")).as("total_weight"))
}
