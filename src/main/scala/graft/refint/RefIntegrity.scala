package graft.refint

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity checks: fact keys must exist in a dimension
  * table (north rule: repo/commit vs a dimension table via broadcast or
  * sort-merge join).
  *
  * Semantics grounding: the reference's keyed point lookup (map probe at
  * app/.../HomeViewModel.kt:108) generalizes to a build-side hash table
  * probed per fact row = broadcast hash join; unmatched rows are the
  * violations (`left_anti`), matched rows the validated subset
  * (`left_semi`).
  *
  * Scale notes:
  *   - `broadcastDim = true` (default) hints the dim side — at 10^12
  *     fact rows the dim (distinct repo/commit pairs) is many orders of
  *     magnitude smaller and must never shuffle the fact table.
  *   - For a genuinely large dim, pass `broadcastDim = false` and let
  *     Catalyst pick sort-merge (AQE converts back to broadcast at
  *     runtime if the dim turns out small).
  *   - SQL-standard RI semantics: a fact row with a NULL key is NOT an
  *     orphan (null never matches nor violates — that's the `required`
  *     rule's job). left_anti treats null keys as unmatched, so we
  *     filter them out explicitly.
  */
object RefIntegrity {

  /** Fact rows whose (non-null) key tuple has no match in `dim`. */
  def orphans(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      broadcastDim: Boolean = true
  ): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    val nonNullKeys = keys.map(col(_).isNotNull).reduce(_ && _)
    fact.where(nonNullKeys).join(d, keys, "left_anti")
  }

  /** Fact rows that pass the RI check (left_semi — no dim columns). */
  def matched(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      broadcastDim: Boolean = true
  ): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    fact.join(d, keys, "left_semi")
  }

  /** One-row summary `(n_rows, n_null_keys, n_orphans)`. */
  def summary(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      broadcastDim: Boolean = true
  ): DataFrame = {
    val nonNullKeys = keys.map(col(_).isNotNull).reduce(_ && _)
    val totals = fact.agg(
      count(lit(1)).as("n_rows"),
      sum(when(!nonNullKeys, 1L).otherwise(0L)).as("n_null_keys"))
    val orphanCount = orphans(fact, dim, keys, broadcastDim)
      .agg(count(lit(1)).as("n_orphans"))
    totals.crossJoin(orphanCount)
  }
}
