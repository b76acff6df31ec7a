package graft.unique

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Uniqueness enforcement on a composite key — north rule:
  * `(repo, path, commit)` with skew handling.
  *
  * Scale notes:
  *   - [[duplicates]] uses a window count over the FULL key. The key is
  *     near-unique by construction, so per-group sizes are tiny and the
  *     single hash-partitioned shuffle on the key cannot produce a hot
  *     partition even when one repo holds 20% of all rows — the skew
  *     lives in `repo`, not in `(repo, path, commit)`. This is why the
  *     dedup key itself is never salted (it would split true duplicate
  *     groups; see SURVEY.md §7.4 risk 3).
  *   - [[groupCountsSalted]] is the two-phase salted aggregate for the
  *     genuinely skewed case: counting per `repo` (hot key). Phase 1
  *     aggregates on (repo, salt) — spreads the hot repo over `nSalts`
  *     reducers; phase 2 re-aggregates the per-salt partials (tiny).
  *   - AQE skew-join/partition-coalescing stays on as the backstop.
  */
object Uniqueness {

  /** All rows participating in a duplicate key group, with the group
    * size attached — report-every-violation semantics (cf. the
    * reference emitting all field errors, not the first).
    */
  def duplicates(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("dup_count", count(lit(1)).over(w))
      .where(col("dup_count") > 1)
  }

  /** Keep exactly one row per key. `tieBreak` orders within a key group
    * (deterministic survivor); defaults to the key itself (arbitrary
    * but stable row when full rows are identical).
    */
  def dedup(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column] = Nil): DataFrame = {
    val order = if (tieBreak.nonEmpty) tieBreak else keys.map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** One-row summary `(n_rows, n_keys, n_dup_keys, n_dup_rows)` —
    * aggregate-of-aggregate: partial map-side counts, then a tiny
    * global rollup. No window, no join.
    */
  def summary(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        sum(when(col("__n") > 1, col("__n")).otherwise(0L)).as("n_dup_rows")
      )

  /** Two-phase salted count per (possibly hot) key — e.g. rows per
    * `repo` under a 20%-hot-repo skew. `nSalts` should approximate the
    * shuffle parallelism.
    *
    * The salt is a hash of the full row's HASHABLE columns (key +
    * payload), not a partition-layout artifact like
    * `monotonically_increasing_id()` — so the salt assignment, and with
    * it every intermediate frame, is identical across reruns and
    * repartitionings (the engine-wide determinism rule; pinned by
    * UniquenessSpec). Columns whose type contains a map are excluded
    * (Spark's hash functions reject MapType — map element order is
    * undefined). A hot KEY still spreads over `nSalts` reducers
    * because its payloads differ; rows identical on every hashable
    * column share a salt, bounding that residual skew by the duplicate
    * multiplicity — if full-row duplicates are the dominant mass, the
    * right tool is [[summary]]/[[dedup]], not a salted count. The
    * degenerate key-only frame (no hashable payload columns) still
    * computes CORRECT counts but cannot spread a hot key — its rows
    * are content-identical, and determinism rules out a layout-derived
    * salt; such frames don't need a two-phase count anyway (the plain
    * groupBy they degenerate to is the right plan for them).
    */
  def groupCountsSalted(df: DataFrame, key: String, nSalts: Int): DataFrame = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val hashableNames = df.schema.fields
      .filter(f => hashable(f.dataType)).map(_.name).toSeq
    val salt = // nothing hashable at all → genuinely constant salt
      if (hashableNames.isEmpty) lit(0L)
      else pmod(xxhash64(hashableNames.map(col): _*), lit(nSalts.toLong))
    df.withColumn("__salt", salt)
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
  }
}
