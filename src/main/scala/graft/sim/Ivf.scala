package graft.sim

import graft.functions.VectorExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the
  * centroid-partitioned scale path complementing the random-hyperplane
  * LSH variant in [[Similarity]]:
  *
  *   - **train**: seeded k-means over the corpus (deterministic init:
  *     the k rows with the smallest seeded hash; a fixed number of
  *     Lloyd's iterations, each ONE distributed assign + mean job —
  *     centroids live on the driver, k·dim doubles, shipped with the
  *     plan);
  *   - **index**: every vector assigned to its nearest centroid list —
  *     one codegen'd argmax projection, one shuffle nowhere (the list
  *     id is just a column);
  *   - **search**: a query probes its `nProbe` closest lists; exact
  *     cosine re-rank inside the probed lists only. Cost per query is
  *     nProbe/k of the corpus instead of all of it.
  *
  * With `nProbe = k` (probe everything) results are EXACTLY the brute
  * force ranking — pinned by IvfSpec; recall at small nProbe is the
  * tunable accuracy/cost trade.
  *
  * Assignment is by maximum dot product over unit-normalized inputs
  * (spherical k-means ≡ cosine assignment); ties break to the larger
  * list id via struct comparison (deterministic).
  */
object Ivf {

  /** Project a unit-L2-normalized copy of `vecCol` as column `out`.
    * The norm goes through its OWN projection first so the transform
    * lambda divides by a per-row attribute — an expression captured in
    * the lambda body re-evaluates PER ELEMENT (the documented HOF
    * gotcha, cf. Dedup.wordShingles), which here would be O(dim²) per
    * row. Zero vectors stay zero (they land in an arbitrary-but-fixed
    * list and never win a cosine ranking anyway).
    */
  private def withUnit(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.select(col("*"), Similarity.norm(col(vecCol)).as(s"${out}__nrm"))
      .select(col("*"),
        when(col(s"${out}__nrm") === 0d, col(vecCol).cast("array<double>"))
          .otherwise(transform(col(vecCol),
            x => x.cast("double") / col(s"${out}__nrm")))
          .as(out))
      .drop(s"${out}__nrm")

  /** Flattened [list][dim] centroid matrix for the native expression. */
  private def flat(centroids: Array[Array[Double]]): Array[Double] = {
    require(centroids.nonEmpty,
      "no centroids — the corpus has no vector with the configured dim")
    val dim = centroids(0).length
    val out = new Array[Double](centroids.length * dim)
    var l = 0
    while (l < centroids.length) {
      System.arraycopy(centroids(l), 0, out, l * dim, dim)
      l += 1
    }
    out
  }

  /** Argmax list over the centroid set — ONE native expression holding
    * the whole centroid matrix as a single plan reference object, so
    * plan size and codegen cost are O(1) in the list count (the
    * composed per-centroid `typedLit` form, kept below as the parity
    * cross-check, explodes plan size and janino compile at the
    * k ≈ 10⁴–10⁵ lists a corpus-scale IVF wants).
    */
  private def nearestList(vec: Column, centroids: Array[Array[Double]]): Column =
    element_at(probeLists(vec, centroids, 1), 1)

  /** Top-`nProbe` lists for a (normalized) vector, as an array of list
    * ids ordered by descending dot (ties to the larger id).
    */
  private def probeLists(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    VectorExprs.centroidTopLists(vec, flat(centroids), centroids(0).length, nProbe)

  /** Composed built-ins formulation of [[probeLists]] — one `(dot,
    * listId)` struct literal PER centroid, ranked by descending struct
    * comparison. Bit-identical to the native expression (pinned by
    * IvfSpec); retained ONLY as its cross-check oracle — O(nLists)
    * plan size makes it unusable at scale.
    */
  private[graft] def probeListsComposed(
      vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    require(centroids.nonEmpty,
      "no centroids — the corpus has no vector with the configured dim")
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        VectorExprs.dotNative(vec, typedLit(c.toSeq)).as("d"),
        lit(i).as("list"))
    }: _*)
    transform(
      slice(reverse(array_sort(scored)), 1, nProbe),
      s => s.getField("list"))
  }

  /** Seeded k-means centroids (k × dim, driver-held). Init = the k
    * corpus vectors with the smallest `xxhash64(id, seed)`
    * (data-dependent spread without RNG — bit-deterministic); `iters`
    * Lloyd's rounds (reproducible up to double-summation order across
    * shuffle fetches — the usual distributed-FP caveat); an emptied
    * list keeps its previous centroid.
    */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      iters: Int = 5,
      seed: Long = 42L,
      scope: graft.util.CacheScope = graft.util.CacheScope.shared): Array[Array[Double]] = {
    require(k > 0 && iters >= 0, s"bad k=$k / iters=$iters")
    // The normalized projection feeds the init sort + one aggregate per
    // Lloyd round — persist it (caller releases the scope) instead of
    // re-scanning and re-normalizing the corpus iters+1 times.
    val vecs = scope.cache(
      withUnit(
        corpus.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
          .select(col(idCol).as("__id"), col(vecCol)),
        vecCol, "__v")
        .select(col("__id"), col("__v")))
    var centroids: Array[Array[Double]] = vecs
      .orderBy(xxhash64(col("__id"), lit(seed)).asc, col("__id").asc)
      .limit(k)
      .select(col("__v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(centroids.nonEmpty,
      s"cannot train IVF centroids: no corpus vector has dim=$dim")
    var it = 0
    while (it < iters) {
      val assigned = vecs.withColumn("__list",
        nearestList(col("__v"), centroids))
      // Element-wise mean per list: explode to (list, pos, x) — the
      // aggregate is O(k·dim) output rows regardless of corpus size.
      val sums = assigned
        .select(col("__list"), posexplode(col("__v")))
        .groupBy(col("__list"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      val counts = Array.fill(centroids.length)(0L)
      sums.foreach { r =>
        val l = r.getInt(0); val p = r.getInt(1)
        next(l)(p) = r.getDouble(2) / r.getLong(3)
        counts(l) = r.getLong(3)
      }
      // re-normalize non-empty centroids (spherical k-means step)
      var l = 0
      while (l < next.length) {
        if (counts(l) > 0) {
          val nrm = math.sqrt(next(l).map(x => x * x).sum)
          if (nrm > 0) next(l) = next(l).map(_ / nrm)
        }
        l += 1
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** `(id, list)` index assignment — pure projection over the corpus. */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      centroids: Array[Array[Double]]): DataFrame =
    withUnit(
      corpus.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
        .select(col(idCol).as("id"), col(vecCol).as("vec")),
      "vec", "__u")
      .select(col("id"), col("vec"),
        nearestList(col("__u"), centroids).as("list"))

  /** Approximate top-k: probe the query's `nProbe` nearest lists, exact
    * cosine re-rank inside them. Output matches
    * [[Similarity.bruteForceTopK]]: `(q_id, vec_id, cos, rank)`.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      iters: Int = 5,
      seed: Long = 42L,
      scope: graft.util.CacheScope = graft.util.CacheScope.shared): DataFrame = {
    require(nProbe >= 1 && nProbe <= nLists, s"nProbe=$nProbe out of 1..$nLists")
    val centroids = trainCentroids(corpus, idCol, vecCol, dim, nLists, iters, seed, scope)
    val cIdx = ivfIndex(corpus, idCol, vecCol, dim, centroids)
      .withColumn("c_norm", Similarity.norm(col("vec")))
    ivfTopKFromIndex(centroids, cIdx, queries, idCol, vecCol, dim, k, nProbe)
  }

  /** [[ivfTopK]] over a PREBUILT index — driver-held `centroids` plus
    * the assignment frame `(id, vec, list, c_norm)` (typically loaded
    * from a persisted index, [[graft.index.IndexStore]]): no k-means
    * re-training, no corpus re-assignment per query batch. When the
    * assignment table is stored `partitionBy(list)`, the broadcast of
    * the probed query lists enables dynamic partition pruning — a probe
    * touching nProbe/k of the lists reads ~nProbe/k of the index.
    */
  def ivfTopKFromIndex(
      centroids: Array[Array[Double]],
      assignments: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.length,
      s"nProbe=$nProbe out of 1..${centroids.length}")
    val qIdx = withUnit(
      queries.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
        .select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
      "q_vec", "__u")
      .select(col("q_id"), col("q_vec"),
        Similarity.norm(col("q_vec")).as("q_norm"),
        explode(probeLists(col("__u"), centroids, nProbe)).as("list"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    assignments.join(broadcast(qIdx), Seq("list"))
      .where(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("vec_id"),
        Similarity.cosineWithNorms(col("q_vec"), col("vec"),
          col("q_norm"), col("c_norm")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
