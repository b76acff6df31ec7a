package graft

import graft.verdict.Expectations
import graft.verdict.Expectations.Expect
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")

  test("evaluate: observed values and pass flags match directly computed stats") {
    val n = docs.count().toDouble
    val nullFrac = docs.where($"text".isNull).count() / n
    val out = Expectations.evaluate(docs, Seq(
        Expect("row_count", lo = 1),
        Expect("null_frac", "text", hi = nullFrac), // exactly at the bound → pass
        Expect("distinct", "lang", lo = 5, hi = 5),
        Expect("mean", "n_chars", lo = 0),
        Expect("max", "n_chars", hi = 0) // deliberately failing
      )).collect().map(r => (r.getAs[String]("check"), r)).toMap

    assert(out("row_count").getAs[Double]("observed") === n)
    assert(out("row_count").getAs[Boolean]("pass"))
    assert(math.abs(out("null_frac").getAs[Double]("observed") - nullFrac) < 1e-12)
    assert(out("null_frac").getAs[Boolean]("pass"))
    assert(out("distinct").getAs[Double]("observed") === 5.0)
    assert(out("mean").getAs[Boolean]("pass"))
    assert(!out("max").getAs[Boolean]("pass"))
    assert(!Expectations.holds(docs, Seq(Expect("max", "n_chars", hi = 0))))
    assert(Expectations.holds(docs, Seq(Expect("row_count", lo = 1))))
  }

  test("grouped expectations: one verdict row per (group, check)") {
    val out = Expectations.evaluate(docs,
      Seq(Expect("row_count", lo = 10), Expect("null_frac", "text", hi = 0.5)),
      groupCols = Seq("lang"))
    val langs = docs.select("lang").distinct().count()
    assert(out.count() === langs * 2)
    assert(out.columns.toSeq ===
      Seq("lang", "check", "column", "q", "observed", "lo", "hi", "pass"))
    // per-group row counts match a direct groupBy
    val direct = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    out.where($"check" === "row_count").collect().foreach { r =>
      assert(r.getAs[Double]("observed") === direct(r.getString(0)))
    }
  }

  test("null observed fails a bounded check; misconfig rejected at construction") {
    val allNull = docs.withColumn("gone", lit(null).cast("double"))
    val out = Expectations.evaluate(allNull,
      Seq(Expect("mean", "gone", lo = 0))).collect().head
    assert(out.isNullAt(out.fieldIndex("observed")))
    assert(!out.getAs[Boolean]("pass")) // no signal must not pass a gate

    assertThrows[IllegalArgumentException](Expect("median", "x"))
    assertThrows[IllegalArgumentException](Expect("mean"))
    assertThrows[IllegalArgumentException](Expect("mean", "x", lo = 2, hi = 1))
  }

  test("grouped holds on an empty table fails, never vacuously passes") {
    val empty = docs.where(lit(false))
    // zero groups → zero verdict rows → the gate must reject
    assert(!Expectations.holds(empty,
      Seq(Expect("row_count", lo = 1000)), groupCols = Seq("lang")))
    // ungrouped form fails via the row_count bound itself
    assert(!Expectations.holds(empty, Seq(Expect("row_count", lo = 1))))
    assert(Expectations.holds(empty, Seq(Expect("row_count", hi = 0))))
  }

  test("approx distinct: sketch within rsd of exact; single-pass plan (no Expand)") {
    val exact = Expectations.evaluate(docs, Seq(Expect("distinct", "doc_id")))
      .collect().head.getAs[Double]("observed")
    val approx = Expectations.evaluate(docs, Seq(Expect("distinct", "doc_id")),
      approxDistinct = true).collect().head.getAs[Double]("observed")
    assert(math.abs(approx - exact) / exact < 0.1)
    val plan = Expectations.evaluate(docs,
        Seq(Expect("distinct", "doc_id"), Expect("distinct", "lang"),
          Expect("row_count")), approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
  }

  test("quantile: exact interpolated bound; approx variant tracks exact") {
    val med = docs.select(percentile(col("n_chars").cast("double"), lit(0.5)))
      .first().getDouble(0)
    val out = Expectations.evaluate(docs, Seq(
        Expect("quantile", "n_chars", lo = med, hi = med), // exactly at bound
        Expect("quantile", "n_chars", lo = 0, hi = 0.25, q = 0.0) // q=0 is min; fails
      )).collect()
    assert(out(0).getAs[Double]("observed") === med)
    assert(out(0).getAs[Boolean]("pass"))
    assert(out(1).getAs[Double]("observed") ===
      docs.agg(min(col("n_chars").cast("double"))).first().getDouble(0))
    assert(!out(1).getAs[Boolean]("pass"))
    // sketch variant within 5% of exact on this distribution
    val approx = Expectations.evaluate(docs,
      Seq(Expect("quantile_approx", "n_chars", lo = 0))).first()
      .getAs[Double]("observed")
    assert(math.abs(approx - med) / med < 0.05)
    assertThrows[IllegalArgumentException] {
      Expect("quantile", "n_chars", q = 1.5)
    }
    // q on a non-quantile check is a misconfiguration (typo'd check),
    // rejected at construction like every other misconfig
    assertThrows[IllegalArgumentException] {
      Expect("mean", "n_chars", q = 0.9)
    }
    // two quantiles on one column stay distinguishable: q is data
    val two = Expectations.evaluate(docs, Seq(
        Expect("quantile", "n_chars", lo = 0, q = 0.05),
        Expect("quantile", "n_chars", lo = 0, q = 0.95)))
      .collect().map(r => r.getAs[Double]("q")).toSet
    assert(two === Set(0.05, 0.95))
  }

  test("unique_frac: key uniqueness as one declared check") {
    val n = docs.count().toDouble
    val distinctLang = docs.select("lang").distinct().count().toDouble
    val out = Expectations.evaluate(docs, Seq(
        Expect("unique_frac", "doc_id", lo = 1.0), // a true key → 1.0
        Expect("unique_frac", "lang", lo = 0.5) // many rows per lang → fails
      )).collect().map(r => (r.getAs[String]("column"), r)).toMap
    assert(out("doc_id").getAs[Double]("observed") === 1.0)
    assert(out("doc_id").getAs[Boolean]("pass"))
    assert(math.abs(out("lang").getAs[Double]("observed") - distinctLang / n) < 1e-12)
    assert(!out("lang").getAs[Boolean]("pass"))
    // sketch variant: within HLL rsd of exact, same single-pass plan
    val approx = Expectations.evaluate(docs,
        Seq(Expect("unique_frac", "doc_id", lo = 0.9)), approxDistinct = true)
      .first()
    assert(math.abs(approx.getAs[Double]("observed") - 1.0) < 0.1)
    // empty table: observed null → bounded check FAILS, never passes
    val empty = Expectations.evaluate(docs.limit(0),
      Seq(Expect("unique_frac", "doc_id", lo = 0.0))).first()
    assert(empty.isNullAt(empty.fieldIndex("observed")))
    assert(!empty.getAs[Boolean]("pass"))
  }

  test("evaluateRelative: ratio gates, missing-baseline and vanished-group rows fail") {
    val base = Seq(("a", 1), ("a", 2), ("b", 1), ("gone", 1))
      .toDF("g", "v")
    val cur = Seq(("a", 2), ("a", 4), ("a", 6), ("b", 1), ("new", 9))
      .toDF("g", "v")
    val baseline = Expectations.evaluate(base,
      Seq(Expect("row_count"), Expect("mean", "v")), Seq("g"))
    val out = Expectations.evaluateRelative(cur,
        Seq(Expect("row_count_rel", lo = 0.5, hi = 2.0),
          Expect("mean_rel", "v", lo = 0.5, hi = 2.0)),
        baseline, Seq("g"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("check")) -> r).toMap
    // a: 3/2 rows, mean 4/1.5 — row_count passes, mean ratio 2.67 fails
    assert(out(("a", "row_count_rel")).getAs[Double]("observed") === 1.5)
    assert(out(("a", "row_count_rel")).getAs[Boolean]("pass"))
    assert(!out(("a", "mean_rel")).getAs[Boolean]("pass"))
    // b unchanged: ratio exactly 1.0, passes
    assert(out(("b", "mean_rel")).getAs[Double]("observed") === 1.0)
    assert(out(("b", "mean_rel")).getAs[Boolean]("pass"))
    // new group: no baseline row → null ratio → FAILS (first-run rule)
    val nw = out(("new", "row_count_rel"))
    assert(nw.isNullAt(nw.fieldIndex("previous")))
    assert(!nw.getAs[Boolean]("pass"))
    // vanished group: baseline row, no current → surfaces and FAILS
    val gone = out(("gone", "row_count_rel"))
    assert(gone.isNullAt(gone.fieldIndex("current")))
    assert(!gone.getAs[Boolean]("pass"))
    // zero previous: ratio undefined → fails even a wide bound
    val z = Expectations.evaluateRelative(
      Seq(("a", null.asInstanceOf[String])).toDF("g", "s"),
      Seq(Expect("null_frac_rel", "s", lo = 0.0, hi = 100.0)),
      Expectations.evaluate(Seq(("a", "x")).toDF("g", "s"),
        Seq(Expect("null_frac", "s")), Seq("g")),
      Seq("g")).first()
    assert(z.getAs[Double]("previous") === 0.0)
    assert(z.isNullAt(z.fieldIndex("observed")) && !z.getAs[Boolean]("pass"))
    // misconfig: kind/entry-point mismatch rejected up front
    assertThrows[IllegalArgumentException] {
      Expectations.evaluate(cur, Seq(Expect("row_count_rel", lo = 1)))
    }
    assertThrows[IllegalArgumentException] {
      Expectations.evaluateRelative(cur, Seq(Expect("row_count", lo = 1)),
        baseline)
    }
    assertThrows[IllegalArgumentException] { Expect("mean_rel", "v", q = 0.5) }
  }

  test("expectation snapshot store: first run fails, stored baseline gates, latest wins") {
    import graft.index.IndexStore
    val dir = java.nio.file.Files.createTempDirectory("graft-expstore").toString
    val path = s"$dir/exp"
    val checks = Seq(Expect("row_count_rel", lo = 0.5, hi = 2.0))
    val snap1 = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("g", "v")
    val snap2 = Seq(("a", 1), ("b", 1), ("b", 2)).toDF("g", "v")
    // FIRST RUN — no store: every bounded relative check FAILS
    val first = IndexStore.expectationsAgainstBaseline(
      snap1, checks, Seq("g"), path)
    assert(first.count() === 2 && first.where(col("pass")).count() === 0)
    // bootstrap snapshot 1, gate snapshot 2 against it: a 2/1, b 1/2
    IndexStore.appendExpectationSnapshot(snap1,
      Seq(Expect("row_count")), Seq("g"), path, "s1")
    val second = IndexStore.expectationsAgainstBaseline(
        snap2, checks, Seq("g"), path)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(second("a").getAs[Double]("observed") === 0.5)
    assert(second("a").getAs[Boolean]("pass"))
    assert(second("b").getAs[Double]("observed") === 2.0)
    // append snapshot 2 → LATEST (not first) becomes the baseline
    IndexStore.appendExpectationSnapshot(snap2,
      Seq(Expect("row_count")), Seq("g"), path, "s2")
    val third = IndexStore.expectationsAgainstBaseline(
        snap2, checks, Seq("g"), path)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(third("a").getAs[Double]("observed") === 1.0)
    assert(third("b").getAs[Double]("observed") === 1.0)
    val (latest, meta) = IndexStore.loadLatestExpectations(spark, path)
    assert(meta.groupCols === "g")
    assert(latest.select("snapshot_id").distinct().head().getString(0) === "s2")
    // groupCols drift against the stored meta is rejected loudly
    assertThrows[IllegalArgumentException] {
      IndexStore.expectationsAgainstBaseline(snap2, checks, Seq("v"), path)
    }
  }

  test("suggest: a slice always passes its own induced suite; drift fails it") {
    val base = Seq(
      (1L, "en", Some(10.0)), (2L, "en", Some(20.0)),
      (3L, "de", Some(30.0)), (4L, "fr", Some(40.0))
    ).toDF("id", "lang", "score")
    val suite = Expectations.suggest(base, Seq("id", "lang", "score"),
      tolerance = 0.25)
    // profile-once-gate-same: every induced bound contains its own
    // observation by construction
    assert(Expectations.holds(base, suite))
    val kinds = suite.map(e => (e.check, e.column)).toSet
    assert(kinds.contains(("unique_frac", "id")))     // id was unique
    assert(kinds.contains(("distinct", "lang")))      // 3 ≤ cap
    assert(kinds.contains(("mean", "score")))         // numeric band
    assert(!kinds.exists(_ == ("unique_frac", "lang"))) // lang was not
    // drift: a new category breaks the induced distinct cap; a fatter
    // table breaks the row_count band
    val drifted = base.union(Seq(
      (5L, "zz", Some(50.0)), (6L, "zz", Some(60.0)),
      (7L, "zz", Some(70.0)), (8L, "zz", Some(80.0)),
      (9L, "zz", Some(90.0))).toDF("id", "lang", "score"))
    val verdict = Expectations.evaluate(drifted, suite)
      .collect().map(r => (r.getAs[String]("check"), r.getAs[String]("column")) -> r.getAs[Boolean]("pass")).toMap
    assert(!verdict(("distinct", "lang")))
    assert(!verdict(("row_count", "")))
    assert(!verdict(("max", "score")))
  }

  test("suggest: all-null numeric induces no numeric bounds; uniqueness needs null-free") {
    val base = Seq(
      (Some(1L), Option.empty[Double]), (Some(1L), None), (None, None)
    ).toDF("k", "v")
    val suite = Expectations.suggest(base, Seq("k", "v"))
    val kinds = suite.map(e => (e.check, e.column)).toSet
    // v is all-null numeric: null_frac ceiling only (observes 1.0,
    // passes); zero distinct values → no distinct cap either
    assert(kinds.filter(_._2 == "v") === Set(("null_frac", "v")))
    // k has dups AND a null: never an induced uniqueness invariant
    assert(!kinds.contains(("unique_frac", "k")))
    assert(Expectations.holds(base, suite))
  }

  test("suggest: sketch profiling never certifies uniqueness and pads distinct caps") {
    val base = Seq((1L, "en"), (2L, "de"), (3L, "fr")).toDF("id", "lang")
    val suite = Expectations.suggest(base, Seq("id", "lang"),
      tolerance = 0.25, approxDistinct = true)
    val kinds = suite.map(e => (e.check, e.column)).toSet
    assert(!kinds.exists(_._1 == "unique_frac")) // sketch can't certify
    val cap = suite.find(e => e.check == "distinct" && e.column == "lang").get
    assert(cap.hi > 3.0 - 1e-9 && cap.hi <= 3.0 * 1.25 + 1e-9) // padded
    // self-pass still holds when gating with the SAME sketch
    assert(Expectations.holds(base, suite, approxDistinct = true))
  }

  test("suggest: empty slice and unknown column are rejected at construction") {
    val df = Seq((1L, "a")).toDF("id", "lang")
    assertThrows[IllegalArgumentException] {
      Expectations.suggest(df.limit(0), Seq("id"))
    }
    assertThrows[IllegalArgumentException] {
      Expectations.suggest(df, Seq("nope"))
    }
    assertThrows[IllegalArgumentException] {
      Expectations.suggest(df, Seq("id"), tolerance = -0.1)
    }
  }

  test("ExpectJson: suites round-trip as canonical JSON; strict parse") {
    import graft.verdict.ExpectJson
    val suite = Seq(
      Expect("row_count", lo = 100, hi = 200.5),
      Expect("null_frac", "text", hi = 0.1),
      Expect("unique_frac", "doc_id", lo = 1.0),
      Expect("quantile", "n_chars", lo = 50, hi = 400, q = 0.9),
      Expect("row_count_rel", lo = 0.6)) // relative kinds serialize too
    val j = ExpectJson.toJson(suite)
    // toString compare: Expect is a case class holding NaN q slots, and
    // NaN != NaN breaks structural equality on identical suites
    assert(ExpectJson.fromJson(j).map(_.toString) === suite.map(_.toString))
    assert(ExpectJson.toJson(ExpectJson.fromJson(j)) === j) // fixpoint
    // unbounded sides are omitted, not rendered as pseudo-infinities
    assert(!j.contains("inf") && !j.contains("Inf"))
    def err(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](ExpectJson.fromJson(json))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' !contains '$frag'")
    }
    err("""[{"check": "row_count", "low": 1}]""", "unknown key 'low'")
    err("""[{"check": "row_count", "lo": 100, "lo": 1}]""", "duplicate keys")
    err("""[{"column": "x"}]""", "missing required key 'check'")
    err("""[{"check": "row_count", "lo": "ten"}]""", "lo must be a number")
    err("""{"check": "row_count"}""", "must be a JSON array")
    err("""[]""", "at least one check")
    // Expect's own closed vocabulary still guards parsed suites
    intercept[IllegalArgumentException](
      ExpectJson.fromJson("""[{"check": "rowcount"}]"""))
    intercept[IllegalArgumentException]( // q on a non-quantile check
      ExpectJson.fromJson("""[{"check": "mean", "column": "x", "q": 0.5}]"""))
  }

  test("ExpectJson: suggest → serialize → parse → gate is lossless end-to-end") {
    import graft.verdict.ExpectJson
    val base = Seq((1L, "en", 10.0), (2L, "de", 20.0)).toDF("id", "lang", "v")
    val suite = Expectations.suggest(base, Seq("id", "lang", "v"))
    val shipped = ExpectJson.fromJson(ExpectJson.toJson(suite))
    assert(shipped.map(_.toString) === suite.map(_.toString))
    assert(Expectations.holds(base, shipped))
  }

  test("relative gates: null group keys align null-safely with their baseline row") {
    val base = Seq((Some("a"), 1), (None, 1), (None, 1)).toDF("g", "v")
    val cur = Seq((Some("a"), 2), (None, 3)).toDF("g", "v")
    val out = Expectations.evaluateRelative(cur,
        Seq(Expect("row_count_rel", lo = 0.4, hi = 2.5)),
        Expectations.evaluate(base, Seq(Expect("row_count")), Seq("g")),
        Seq("g"))
      .collect().map(r => Option(r.getAs[String]("g")) -> r).toMap
    // the NULL-keyed group is ONE aligned row (ratio 1/2), not a
    // failing first-run + vanished pair
    assert(out.size === 2)
    assert(out(None).getAs[Double]("observed") === 0.5)
    assert(out(None).getAs[Boolean]("pass"))
    assert(out(Some("a")).getAs[Double]("observed") === 1.0)
  }

  test("snapshot store: crashed/zero-row first append never poisons; history prunes; ids path-safe") {
    import graft.index.IndexStore
    val dir = java.nio.file.Files.createTempDirectory("graft-expstore2").toString
    val path = s"$dir/exp"
    val data = Seq(("a", 1), ("b", 2)).toDF("g", "v")
    val baseChecks = Seq(Expect("row_count"))
    val relChecks = Seq(Expect("row_count_rel", lo = 0.5, hi = 2.0))
    // zero-row first append: meta lands, data does not — the store must
    // behave as FIRST RUN (fail bounded rel checks), and the next
    // append must restart at seq 0, not crash on the missing data path
    assert(IndexStore.appendExpectationSnapshot(
      data.limit(0), baseChecks, Seq("g"), path, "s0") === 0L)
    val first = IndexStore.expectationsAgainstBaseline(
      data, relChecks, Seq("g"), path)
    assert(first.count() === 2 && first.where(col("pass")).count() === 0)
    assertThrows[IllegalArgumentException] {
      IndexStore.loadLatestExpectations(spark, path) // loud, names the cause
    }
    assert(IndexStore.appendExpectationSnapshot(
      data, baseChecks, Seq("g"), path, "s1") === 2L)
    assert(IndexStore.expectationsAgainstBaseline(
      data, relChecks, Seq("g"), path).where(col("pass")).count() === 2)
    // history pruning: keep only the newest K snapshots
    (2 to 5).foreach(i => IndexStore.appendExpectationSnapshot(
      data, baseChecks, Seq("g"), path, s"s$i"))
    assert(IndexStore.pruneExpectationSnapshots(spark, path, keepLast = 2) === 3L)
    val left = spark.read.parquet(s"$path/data")
      .select("snapshot_id").distinct().as[String].collect().toSet
    assert(left === Set("s4", "s5"))
    val (latest, _) = IndexStore.loadLatestExpectations(spark, path)
    assert(latest.select("snapshot_id").distinct().head().getString(0) === "s5")
    // ids become partition directories — unsafe ones rejected up front
    assertThrows[IllegalArgumentException] {
      IndexStore.appendExpectationSnapshot(
        data, baseChecks, Seq("g"), path, "bad/id")
    }
  }
}
