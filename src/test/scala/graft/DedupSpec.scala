package graft

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"

  test("exact dedup: summary counts duplicates by normalized content") {
    val df = docs(
      1L -> "hello world",
      2L -> "  Hello   WORLD ", // same after normalization
      3L -> "something else",
      4L -> "hello world")
    val s = Dedup.exactSummary(df, "text").head()
    assert(s.getAs[Long]("n_rows") === 4L)
    assert(s.getAs[Long]("n_distinct") === 2L)
    assert(s.getAs[Long]("n_dup_rows") === 2L)

    val kept = Dedup.exactDedup(df, "doc_id", "text").select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L)) // min-id survivor

    val dups = Dedup.exactDuplicates(df, "doc_id", "text").head()
    assert(dups.getAs[Long]("n_rows") === 3L)
    assert(dups.getAs[Long]("keep_id") === 1L)
  }

  test("word shingles: distinct n-grams, short-text guard") {
    val sh = docs(1L -> "a b c d", 2L -> "a b", 3L -> "x x x x x")
      .select($"doc_id", Dedup.wordShingles($"text", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) === Seq("a b c", "b c d"))
    assert(sh(2L) === Seq.empty) // shorter than n
    assert(sh(3L) === Seq("x x x")) // distinct collapses repeats
  }

  test("jaccard pairs: identical docs score 1.0, disjoint docs absent") {
    val df = docs(
      1L -> base,
      2L -> base, // exact dup → jaccard 1.0
      3L -> base.replace("dog", "wolf"), // near dup
      4L -> "completely different words entirely unrelated content here today")
    val pairs = Dedup
      .jaccardPairs(df, "doc_id", "text", n = 3, maxDf = 100, minJaccard = 0.1)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((1L, 2L)) === 1.0)
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("jaccard maxDf drops stop-shingles from candidates") {
    // 5 docs all sharing one 3-gram; maxDf=4 removes it entirely.
    val df = docs((1L to 5L).map(i => i -> s"common shared phrase unique$i word$i tail$i"): _*)
    val pairs =
      Dedup.jaccardPairs(df, "doc_id", "text", n = 3, maxDf = 4, minJaccard = 0.01)
    assert(pairs.count() === 0L)
  }

  test("contamination: probe prefix contained in its source doc; unrelated probe absent") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog near the quiet river bank today",
      2L -> "completely different words entirely unrelated content goes right here now")
    val probe = docs(
      10L -> "the quick brown fox jumps over the lazy dog", // prefix of doc 1
      11L -> "nothing from either corpus document appears within this probe")
      .withColumnRenamed("doc_id", "probe_id")
    val pairs = Dedup.contaminationPairs(corpus, "doc_id", probe, "probe_id",
        "text", n = 3, maxDf = 100, minContainment = 0.3)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id")) ->
        r.getAs[Double]("containment"))
      .toMap
    // every trigram of the prefix appears in doc 1 → containment 1.0
    assert(pairs((10L, 1L)) === 1.0)
    assert(!pairs.keySet.exists { case (p, _) => p == 11L })
    assert(!pairs.keySet.exists { case (_, c) => c == 2L })
    // broadcastProbe is a pure execution hint — identical rows
    val bcast = Dedup.contaminationPairs(corpus, "doc_id", probe, "probe_id",
      "text", n = 3, maxDf = 100, minContainment = 0.3, broadcastProbe = true)
    val plain = Dedup.contaminationPairs(corpus, "doc_id", probe, "probe_id",
      "text", n = 3, maxDf = 100, minContainment = 0.3)
    assert(bcast.exceptAll(plain).isEmpty && plain.exceptAll(bcast).isEmpty)
  }

  test("contaminatedProbes: deterministic best match, tie-broken by (n_common, corpus_id)") {
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta") // exact dup of 1
    val probe = docs(10L -> "alpha beta gamma delta epsilon")
      .withColumnRenamed("doc_id", "probe_id")
    val best = Dedup.contaminatedProbes(
        Dedup.contaminationPairs(corpus, "doc_id", probe, "probe_id", "text",
          n = 3, maxDf = 100, minContainment = 0.3))
      .collect()
    assert(best.length === 1)
    val r = best.head
    assert(r.getAs[Long]("probe_id") === 10L)
    assert(r.getAs[Long]("n_matches") === 2L)
    assert(r.getAs[Double]("max_containment") === 1.0)
    // identical containment and n_common → larger corpus_id wins
    assert(r.getAs[Long]("best_corpus_id") === 2L)
  }

  test("minhash: signature length k; estimated jaccard tracks exact for near-dups") {
    val df = docs(
      1L -> base,
      2L -> base,
      3L -> base.replace("dog", "wolf"),
      4L -> "entirely unrelated totally different zebra xylophone quantum")
    val sigs = Dedup.minHashSignatures(df, "doc_id", "text", k = 64, shingleN = 8)
    val byId = sigs.as[(Long, Seq[Long])].collect().toMap
    assert(byId(1L).length === 64)
    assert(byId(1L) === byId(2L)) // identical text → identical signature

    val nd = Dedup
      .minHashNearDuplicates(df, "doc_id", "text", k = 64, bands = 16,
        shingleN = 8, minEstJaccard = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("est_jaccard"))
      .toMap
    assert(nd((1L, 2L)) === 1.0)
    assert(nd.contains((1L, 3L))) // near-dup found via LSH
    assert(!nd.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: near-dups land within small hamming distance, unrelated far") {
    val df = docs(
      1L -> base,
      2L -> base.replace("dog", "wolf"),
      3L -> "entirely unrelated totally different zebra xylophone quantum mechanics")
    val hashes = Dedup.simHash(df, "doc_id", "text").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(2L)) <= 8)
    assert(ham(hashes(1L), hashes(3L)) > 8)

    val pairs = Dedup
      .simHashNearDuplicates(df, "doc_id", "text", maxHamming = 8)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash identical docs: hamming 0, found at maxHamming 3 via pigeonhole") {
    val df = docs(1L -> base, 2L -> base, 3L -> (base + " extra trailing words appended here"))
    val pairs = Dedup
      .simHashNearDuplicates(df, "doc_id", "text", maxHamming = 3)
      .collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")), r.getAs[Int]("hamming_dist")))
      .toMap
    assert(pairs((1L, 2L)) === 0)
  }

  test("simhash pigeonhole is exact at radius > 3 (chunk count derived from radius)") {
    // 12 single-word variants of the same sentence: pairwise hamming
    // spans 0..~20. The candidate join must find EXACTLY the pairs a
    // brute-force hamming scan finds at the configured radius (the old
    // fixed-4-chunk join silently lost recall past radius 3).
    val df = docs((1L to 12L).map(i => i -> base.replace("dog", s"w$i")): _*)
    val hashes = Dedup.simHash(df, "doc_id", "text").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (radius <- Seq(4, 6, 10)) {
      val expected = (for {
        a <- hashes.keys; b <- hashes.keys
        if a < b && ham(hashes(a), hashes(b)) <= radius
      } yield (a, b)).toSet
      val got = Dedup.simHashNearDuplicates(df, "doc_id", "text", maxHamming = radius)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(got === expected, s"radius $radius")
    }
    assertThrows[IllegalArgumentException] {
      Dedup.simHashNearDuplicates(df, "doc_id", "text", maxHamming = 16)
    }
  }

  test("mining jobs leave no cached frames behind after scope release") {
    val df = docs((1L to 50L).map(i => i -> s"$base unique token number $i here"): _*)
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    graft.util.CacheScope.withScope { sc =>
      Dedup.minHashNearDuplicates(df, "doc_id", "text", k = 64, bands = 16,
        shingleN = 8, minEstJaccard = 0.5, scope = sc).count()
      assert(persisted > before) // the job really did cache intermediates
    }
    assert(persisted === before)
    graft.util.CacheScope.withScope { sc =>
      Dedup.jaccardPairs(df, "doc_id", "text", scope = sc).count()
    }
    assert(persisted === before) // two consecutive jobs: zero cache growth
  }

  test("lsh bucket stats report overflow accounting") {
    val df = docs((1L to 10L).map(i => i -> base): _*) // all identical
    val sigs = Dedup.minHashSignatures(df, "doc_id", "text", k = 64, shingleN = 8)
    val stats = Dedup.lshBucketStats(sigs, bands = 16, maxBucket = 5).head()
    // 10 identical docs → every band bucket has size 10 > 5 → all overflow
    assert(stats.getAs[Long]("max_bucket") === 10L)
    assert(stats.getAs[Long]("lsh_bucket_overflow") === 160L)
  }

  test("connected components: transitive closure with min-id labels") {
    // Two clusters — one needing transitivity (1-2, 2-3 without 1-3) —
    // plus an isolated pair and a self-loop.
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (7L, 7L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 7L -> 7L))

    val sized = Dedup.clusterAssignments(pairs)
      .select($"id", $"n_members").as[(Long, Long)].collect().toMap
    assert(sized(1L) === 3L && sized(3L) === 3L && sized(10L) === 2L && sized(7L) === 1L)
  }

  test("connected components: superseded rounds freed in-loop, final round on scope release") {
    // A path graph forces many rounds; executor storage must hold at
    // most the live rounds (prior localCheckpoint blocks unpersisted as
    // the loop advances), and release() must clear the final round too.
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val before = persisted
    graft.util.CacheScope.withScope { sc =>
      val cc = Dedup.connectedComponents(chain, scope = sc)
      assert(cc.count() === 10)
      // live storage: the edges cache + at most the final TWO rounds'
      // checkpoints (next + the just-superseded labels), never one per
      // round (this graph needs ≥4 rounds)
      assert(persisted <= before + 3)
    }
    assert(persisted === before)
  }

  test("connected components: long chain converges; maxIters guard throws") {
    // A 12-node path graph — worst-case diameter for label propagation.
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain).as[(Long, Long)].collect().toMap
    assert(cc.size === 12 && cc.values.forall(_ === 1L))
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 2)
    }
  }

  test("dedupByClusters keeps one survivor per cluster, passes untouched rows") {
    val df = docs((1L to 6L).map(i => i -> s"doc $i"): _*)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClusters(df, "doc_id", pairs)
      .select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L, 5L)) // 4 in no pair → passes through
  }
}
