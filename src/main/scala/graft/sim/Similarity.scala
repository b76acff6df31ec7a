package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH bucketing as the 100 TB scale path,
  * and cosine near-duplicate pair mining.
  *
  * Scale design:
  *   - Vectors stay `array<float>` on disk (parquet list<float>); all
  *     math is Catalyst higher-order functions (`zip_with`/`aggregate`)
  *     in double precision — no UDFs, no driver collect of vectors.
  *   - Brute force is (queries × corpus) with the QUERY side broadcast:
  *     right for "few queries, huge corpus". Per-query top-k is a
  *     window over cosine — with k small, AQE keeps partitions balanced
  *     because the pre-window shuffle is keyed by query id.
  *   - LSH: `nTables` independent sets of `nPlanes` deterministic
  *     hyperplanes (seeded, driver-computed constants — O(tables ×
  *     planes × dim) doubles, broadcast with the plan). Candidates =
  *     same bucket in ANY table; cost is bucket-size² bounded by
  *     2^nPlanes spread. Exactness is traded for recall measured in
  *     `SimilaritySpec` against the brute-force baseline.
  */
object Similarity {

  /** Sequential-fold dot product in double precision (deterministic
    * summation order — reproducible against the DuckDB oracle).
    * Native codegen'd expression — the higher-order-function
    * formulation ([[dotHof]]) is interpreted per element and measured
    * ~3× slower end-to-end; results are bit-identical
    * (VectorExprsSpec).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotNative(a, b)

  /** Built-ins-only reference formulation of [[dot]] (cross-check). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe zero guard for zero vectors. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, norm(a), norm(b))

  /** Cosine with caller-precomputed norms (identical arithmetic —
    * na·nb multiplied in the same order as norm(a)·norm(b)).
    */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val d = dot(a, b)
    val n = na * nb
    when(n === 0d, lit(0d)).otherwise(d / n)
  }

  /** Exact top-k nearest corpus vectors per query vector by cosine.
    * Output: (q_id, vec_id, cos, rank), rank 1..k, ties broken by
    * vec_id (deterministic). Self-matches (same id) excluded.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // Norms are precomputed ONCE PER SIDE before the pair join — the
    // naive per-pair cosine would fold each 64-dim array three times
    // per pair (O(3·|Q|·|C|·d) instead of O(|Q|·|C|·d + (|Q|+|C|)·d)).
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        cosineWithNorms(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1] as a
    * pure function of (seed, table, plane, dim index) — same splitmix64
    * finalizer used by java.util.SplittableRandom (public algorithm).
    */
  private def planeComponent(seed: Long, table: Int, plane: Int, d: Int): Double = {
    var z = seed + 0x9e3779b97f4a7c15L * ((table.toLong << 40) + (plane.toLong << 20) + d + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Flattened [table][plane][dim] hyperplane matrix (driver-side
    * constants, shipped once with the plan).
    */
  private def planeMatrix(seed: Long, nTables: Int, nPlanes: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](nTables * nPlanes * dim)
    var i = 0
    for (t <- 0 until nTables; p <- 0 until nPlanes; d <- 0 until dim) {
      out(i) = planeComponent(seed, t, p, d); i += 1
    }
    out
  }

  /** (id, table, bucket) index — `nTables` buckets per vector, all
    * computed by ONE native [[graft.functions.HyperplaneBuckets]] call
    * per row (the composed per-plane-dot expression form compiles
    * nTables·nPlanes literal-array dots — plan-time cost that dwarfed
    * the actual scan at bench scale).
    */
  def lshIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      nPlanes: Int = 12,
      nTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val planes = planeMatrix(seed, nTables, nPlanes, dim)
    val buckets = graft.functions.VectorExprs
      .hyperplaneBuckets(col(vecCol), planes, nTables, nPlanes, dim)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"), posexplode(buckets))
      .select(col("id"), col("vec"), col("pos").as("table"), col("col").as("bucket"))
  }

  /** Approximate top-k: candidates share a bucket with the query in any
    * table; exact cosine + window top-k over the candidate set.
    * Output schema matches [[bruteForceTopK]] (+ possibly fewer rows
    * when recall < 1).
    */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nPlanes: Int = 12,
      nTables: Int = 4,
      seed: Long = 42L): DataFrame =
    annTopKFromIndex(
      lshIndex(corpus, idCol, vecCol, dim, nPlanes, nTables, seed)
        .withColumn("c_norm", norm(col("vec"))),
      queries, idCol, vecCol, dim, k, nPlanes, nTables, seed)

  /** [[annTopK]] over a PREBUILT corpus-side bucket index `(id, vec,
    * table, bucket, c_norm)` — the build-once/query-many path
    * ([[graft.index.IndexStore]] persists/loads it): only the QUERY
    * side is hashed at query time (same seed/planes — deterministic),
    * the corpus is never re-bucketed or re-normed.
    */
  def annTopKFromIndex(
      corpusIndex: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nPlanes: Int = 12,
      nTables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val cIdx = corpusIndex
    val qIdx = lshIndex(queries, idCol, vecCol, dim, nPlanes, nTables, seed)
      .select(col("id").as("q_id"), col("vec").as("q_vec"),
        norm(col("vec")).as("q_norm"), col("table"), col("bucket"))
    // Cosine is computed BEFORE the pair-dedup so the dedup shuffle
    // carries three scalars (~24 B/row), not two 64-float vectors; the
    // per-bucket recompute is cheap (codegen'd dot) and the map-side
    // partial max dedups most bucket collisions before the exchange.
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    cIdx.join(broadcast(qIdx), Seq("table", "bucket"))
      .where(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("vec_id"),
        cosineWithNorms(col("q_vec"), col("vec"), col("q_norm"), col("c_norm")).as("cos"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(max(col("cos")).as("cos")) // identical across buckets; max = any
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** All pairs (id_a < id_b) with cosine ≥ `minCosine` — brute-force
    * variant for modest corpora / verification.
    */
  def nearDupPairsExact(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      norm(col(vecCol)).as("norm_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      norm(col(vecCol)).as("norm_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineWithNorms(col("vec_a"), col("vec_b"), col("norm_a"), col("norm_b")).as("cos"))
      .where(col("cos") >= minCosine)
  }

  /** LSH-bucketed near-duplicate pairs — the scale path: pairs only
    * form inside buckets (2^nPlanes-way spread per table).
    */
  def nearDupPairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      minCosine: Double,
      nPlanes: Int = 10,
      nTables: Int = 6,
      seed: Long = 42L): DataFrame = {
    val idx = lshIndex(df, idCol, vecCol, dim, nPlanes, nTables, seed)
      .withColumn("nrm", norm(col("vec")))
    val a = idx.select(col("table"), col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("norm_a"))
    val b = idx.select(col("table"), col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("norm_b"))
    // Compute + threshold the cosine BEFORE the pair-dedup: the dedup
    // shuffle then carries only qualifying (id_a, id_b, cos) scalar rows
    // instead of full vector pairs (same result — cos is identical for
    // every bucket occurrence of a pair).
    a.join(b, Seq("table", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineWithNorms(col("vec_a"), col("vec_b"), col("norm_a"), col("norm_b")).as("cos"))
      .where(col("cos") >= minCosine)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cos")).as("cos"))
  }
}
