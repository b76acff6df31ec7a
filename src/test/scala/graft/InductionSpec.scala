package graft

import graft.schema.Induction
import graft.validate.Validator
import org.apache.spark.sql.functions._

class InductionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
  private val docFields = Seq("doc_id", "text", "lang", "source", "n_chars")

  test("profile: per-field stats match directly computed values") {
    val df = Seq(
      (1L, "en", "12.5"),
      (2L, "en", "7"),
      (3L, null.asInstanceOf[String], "oops"),
      (4L, "zh", null.asInstanceOf[String])
    ).toDF("id", "lang", "score")
    val p = Induction.profile(df, Seq("id", "lang", "score"), exact = true)
      .collect().map(r => r.getAs[String]("field") -> r).toMap

    assert(p("id").getAs[Long]("n_rows") === 4L)
    assert(p("id").getAs[Long]("n_null") === 0L)
    assert(p("id").getAs[Long]("n_distinct") === 4L)
    assert(p("id").getAs[Double]("numeric_frac") === 1.0)
    assert(p("id").getAs[Double]("min_num") === 1.0)
    assert(p("id").getAs[Double]("max_num") === 4.0)
    assert(p("id").getAs[Long]("min_len") === 1L)

    assert(p("lang").getAs[Long]("n_null") === 1L)
    assert(p("lang").getAs[Double]("null_frac") === 0.25)
    assert(p("lang").getAs[Long]("n_distinct") === 2L)
    assert(p("lang").getAs[Double]("numeric_frac") === 0.0)
    assert(p("lang").isNullAt(p("lang").fieldIndex("min_num")))

    // score: 2 of 3 non-null values parse as double
    assert(math.abs(p("score").getAs[Double]("numeric_frac") - 2.0 / 3) < 1e-12)
    assert(p("score").getAs[Double]("min_num") === 7.0)
    assert(p("score").getAs[Double]("max_num") === 12.5)
    assert(p("score").getAs[Long]("max_len") === 4L)
  }

  test("suggestSchema is self-consistent: induced rules accept the profiled corpus") {
    val schema = Induction.suggestSchema(docs, docFields)
    assert(Validator.violations(docs, schema, Seq("doc_id")).isEmpty)
  }

  test("suggestSchema induces the expected rule kinds and rejects out-of-distribution rows") {
    val schema = Induction.suggestSchema(docs, docFields)
    val byField = schema.fields.toMap

    // doc_id / n_chars: never null → required, numeric bounds observed
    assert(byField("doc_id").required && byField("doc_id").min.isDefined)
    val (lo, hi) = (byField("n_chars").min.get, byField("n_chars").max.get)
    assert(lo <= hi)
    // lang: low-cardinality string → allowed set induced
    assert(byField("lang").allowed.exists(_.nonEmpty))
    // text: high-cardinality string → length bounds, no allowed set
    assert(byField("text").allowed.isEmpty)
    assert(byField("text").maxLength.isDefined)

    // A row outside the profiled distribution fires the induced rules:
    // unknown lang (allowed), out-of-range n_chars (max), null doc_id
    // (required).
    val bad = Seq((null.asInstanceOf[java.lang.Long], "tlh", (hi + 1000).toLong))
      .toDF("doc_id", "lang", "n_chars")
      .withColumn("text", lit("x"))
      .withColumn("source", lit(null).cast("string"))
    val v = Validator.violations(bad, schema, Seq("doc_id"))
      .select("field", "rule").as[(String, String)].collect().toSet
    assert(v.contains(("doc_id", "required")))
    assert(v.contains(("lang", "allowed")))
    assert(v.contains(("n_chars", "max")))
  }

  test("profile approx mode: HLL distinct within rsd of exact; no Expand in the plan") {
    val exact = Induction.profile(docs, Seq("lang", "doc_id"), exact = true)
      .collect().map(r => r.getAs[String]("field") -> r.getAs[Long]("n_distinct")).toMap
    val approx = Induction.profile(docs, Seq("lang", "doc_id"))
      .collect().map(r => r.getAs[String]("field") -> r.getAs[Long]("n_distinct")).toMap
    approx.foreach { case (f, a) =>
      assert(math.abs(a - exact(f)).toDouble / exact(f) < 0.1, s"field $f")
    }
    // the sketch path must plan a single-pass aggregate (no Expand —
    // the ×fields row amplification exact count-distinct needs)
    val plan = Induction.profile(docs, docFields)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
  }

  test("diff: self-diff empty; added/removed fields; direction classification per aspect") {
    import graft.schema.FieldSpec
    val a = graft.schema.Schema.of(
      "id" -> FieldSpec(required = true, min = Some(0), max = Some(100)),
      "lang" -> FieldSpec(allowed = Some(Seq("en", "de", "fr"))),
      "old" -> FieldSpec())
    // self-diff is empty — no spurious drift
    assert(Induction.diff(spark, a, a).count() === 0)
    val b = graft.schema.Schema.of(
      "id" -> FieldSpec(required = false, min = Some(10), max = Some(200),
        regex = Some("[0-9]+")),
      "lang" -> FieldSpec(allowed = Some(Seq("en", "de")),
        forbidden = Some(Seq("xx"))),
      "fresh" -> FieldSpec())
    val d = Induction.diff(spark, a, b).collect()
      .map(r => (r.getAs[String]("field"), r.getAs[String]("aspect")) ->
        ((r.getAs[String]("before"), r.getAs[String]("after"),
          r.getAs[String]("change")))).toMap
    assert(d(("old", "field")) === (("present", null, "removed")))
    assert(d(("fresh", "field")) === ((null, "present", "added")))
    assert(d(("id", "required")) === (("true", "false", "loosened")))
    assert(d(("id", "min")) === (("0", "10", "tightened")))
    assert(d(("id", "max")) === (("100", "200", "loosened")))
    assert(d(("id", "regex")) === ((null, "[0-9]+", "tightened"))) // rule appears
    assert(d(("lang", "allowed")) === (("de,en,fr", "de,en", "tightened")))
    assert(d(("lang", "forbidden")) === ((null, "xx", "tightened")))
    // incomparable allowed sets → changed; vanished rule → loosened
    val c = Induction.diff(spark,
        graft.schema.Schema.of("lang" -> FieldSpec(
          allowed = Some(Seq("en", "de")), maxLength = Some(5))),
        graft.schema.Schema.of("lang" -> FieldSpec(
          allowed = Some(Seq("en", "zh")))))
      .collect().map(r => r.getAs[String]("aspect") ->
        r.getAs[String]("change")).toMap
    assert(c("allowed") === "changed")
    assert(c("maxlength") === "loosened")
    // induced end-to-end: filtering a value out of a slice tightens
    val full = Induction.suggestSchema(docs, Seq("lang", "n_chars"))
    val cut = Induction.suggestSchema(
      docs.where($"lang" =!= "fr"), Seq("lang", "n_chars"))
    val rows = Induction.diff(spark, full, cut).collect()
      .map(r => (r.getAs[String]("field"), r.getAs[String]("aspect")) ->
        r.getAs[String]("change")).toMap
    assert(rows(("lang", "allowed")) === "tightened")
  }

  test("merge: the widened schema accepts the union of the slices it was induced from") {
    import graft.schema.{FieldSpec, Schema, Severity}
    val a = docs.where($"doc_id" % 3 === 0)
    val b = docs.where($"doc_id" % 3 === 1)
    val merged = Induction.merge(
      Induction.suggestSchema(a, docFields),
      Induction.suggestSchema(b, docFields))
    // the defining law: each slice passes its own induction, so the
    // union passes the merge
    assert(Validator.violations(a.union(b), merged, Seq("doc_id")).isEmpty)
    // widening is visible: the merged allowed set is the union
    val mLang = merged.fields.toMap.apply("lang")
    val aLang = Induction.suggestSchema(a, Seq("lang")).fields.head._2
    val bLang = Induction.suggestSchema(b, Seq("lang")).fields.head._2
    assert(mLang.allowed.get.toSet ===
      aLang.allowed.get.toSet ++ bLang.allowed.get.toSet)
    // idempotent and commutative (up to field order)
    val s1 = Induction.suggestSchema(a, docFields)
    assert(Induction.merge(s1, s1) === s1)
    val ba = Induction.merge(Induction.suggestSchema(b, docFields), s1)
    assert(Induction.diff(spark,
      Induction.merge(s1, Induction.suggestSchema(b, docFields)), ba).isEmpty)

    // aspect widening on hand-built induced-shaped specs
    val m = Induction.merge(
      Schema.of(
        "x" -> FieldSpec(required = true, min = Some(0d), max = Some(10d),
          forbidden = Some(Seq("p", "q")), severity = Severity.Fatal),
        "only_a" -> FieldSpec(required = true)),
      Schema.of(
        "x" -> FieldSpec(required = false, nullable = true, min = Some(-5d),
          forbidden = Some(Seq("q", "r")), severity = Severity.Warning))
    ).fields.toMap
    assert(m("x").min === Some(-5d))
    assert(m("x").max === None)            // one side unbounded → unbounded
    assert(!m("x").required && m("x").nullable)
    assert(m("x").forbidden === Some(Seq("q"))) // deny-list intersection
    assert(m("x").severity === Severity.Warning) // loosest channel
    assert(!m("only_a").required && m("only_a").nullable) // solo field widened

    // declared machinery is rejected at construction (E1)
    assertThrows[IllegalArgumentException] {
      Induction.merge(
        Schema.of("x" -> FieldSpec(dependencies = Map("y" -> Nil))),
        Schema.of("x" -> FieldSpec()))
    }

    // an allowed UNION past the induction cap is DROPPED, exactly as
    // suggestSchema would drop the rule on the combined corpus — the
    // streaming fold must not grow the list without bound
    val capped = Induction.merge(
      Schema.of("t" -> FieldSpec(allowed = Some((1 to 15).map(i => s"a$i")))),
      Schema.of("t" -> FieldSpec(allowed = Some((1 to 15).map(i => s"b$i")))),
      maxAllowed = 20).fields.head._2
    assert(capped.allowed === None)
    val kept = Induction.merge(
      Schema.of("t" -> FieldSpec(allowed = Some(Seq("a", "b")))),
      Schema.of("t" -> FieldSpec(allowed = Some(Seq("b", "c")))),
      maxAllowed = 20).fields.head._2
    assert(kept.allowed === Some(Seq("a", "b", "c")))
    // fold-shape independence ACROSS the cap: the union exceeds the
    // cap in one intermediate but not the other — both shapes must
    // still agree (an over-cap total implies an over-cap intermediate
    // in every shape, so the drop is shape-independent)
    val sa = Schema.of("t" -> FieldSpec(allowed = Some((1 to 12).map(i => f"a$i%02d"))))
    val sb = Schema.of("t" -> FieldSpec(allowed = Some((1 to 12).map(i => f"b$i%02d"))))
    val sc = Schema.of("t" -> FieldSpec(allowed = Some(Seq("a01"))))
    val left = Induction.merge(Induction.merge(sa, sb), sc).fields.head._2
    val right = Induction.merge(sa, Induction.merge(sb, sc)).fields.head._2
    assert(left.allowed === None && right.allowed === None)

    // an AUTHORED over-cap allowed list is rejected loudly, never
    // silently dropped by the union cap (induced schemas can't carry
    // one — suggestSchema's own cap guarantees it)
    assertThrows[IllegalArgumentException] {
      Induction.merge(
        Schema.of("t" -> FieldSpec(allowed = Some((1 to 30).map(_.toString)))),
        Schema.of("t" -> FieldSpec()),
        maxAllowed = 20)
    }
  }
}
