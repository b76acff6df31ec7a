package graft

import graft.data.SynthGen
import graft.drift.Drift
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions → psi ≈ 0 and ks ≈ 0") {
    val df = spark.range(0, 2000).select(
      lit("g").as("g"), pmod(col("id"), lit(100)).cast("double").as("v"))
    val out = Drift.compare(df, df, "v", Seq("g"), 10, 0d, 100d).first()
    assert(math.abs(out.getAs[Double]("psi")) < 1e-9)
    assert(math.abs(out.getAs[Double]("ks")) < 1e-9)
  }

  test("shifted distribution → large psi/ks; unshifted → small") {
    val base = spark.range(0, 4000).select(
      when(pmod(col("id"), lit(2)) === 0, lit("stable")).otherwise(lit("shifted")).as("g"),
      pmod(col("id"), lit(100)).cast("double").as("v"))
    val cur = base.withColumn("v",
      when(col("g") === "shifted", col("v") + 50d).otherwise(col("v")))
    val out = Drift.compare(cur, base, "v", Seq("g"), 10, 0d, 150d)
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("psi"), r.getAs[Double]("ks"))).toMap
    assert(out("stable")._1 < 0.01 && out("stable")._2 < 0.01)
    assert(out("shifted")._1 > 0.5 && out("shifted")._2 > 0.3)
  }

  test("out-of-range values clamp to edge bins; nulls excluded") {
    val df = Seq(("g", Some(-5d)), ("g", Some(500d)), ("g", None))
      .toDF("g", "v")
    val b = Drift.bins(df, "v", Seq("g"), 10, 0d, 100d)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(b === Set((0L, 1L), (9L, 1L)))
  }

  test("synthetic python content drifts vs global (injected wider length dist)") {
    val files = SynthGen.codeFiles(spark, SynthGen.Config(rows = 20000L))
      .where(col("content").isNotNull && col("lang").isin(SynthGen.langs: _*))
      .withColumn("len", length(col("content")))
    val out = Drift.againstGlobal(files, "len", Seq("lang"), 20, 0d, 800d)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    val others = SynthGen.langs.filterNot(_ == "python").map(out)
    assert(out("python") > others.max * 1.5,
      s"python psi ${out("python")} should dominate $others")
  }

  test("againstGlobal densifies missing (group, bin) combos") {
    // group "b" never hits bin 1 but the global does → PSI must include
    // the (p=eps, q>0) term rather than dropping the bin.
    val df = Seq(("a", 5d), ("a", 15d), ("b", 5d)).toDF("g", "v")
    val out = Drift.againstGlobal(df, "v", Seq("g"), 2, 0d, 20d)
      .where(col("g") === "b").first()
    assert(out.getAs[Double]("psi") > 1.0) // missing a third of global mass
    assert(out.getAs[Double]("ks") > 0.3)
  }

  test("persisted baseline sketch scores identically to two-sided compare") {
    val files = SynthGen.codeFiles(spark, SynthGen.Config(rows = 8000L))
      .where(col("content").isNotNull && col("lang").isin(SynthGen.langs: _*))
      .withColumn("len", length(col("content")))
    val base = files.where(col("id") % 2 === 0)
    val cur = files.where(col("id") % 2 === 1)

    // Write the sketch to parquet and read it back — the baseline DATA
    // is never rescanned by the comparison.
    val dir = java.nio.file.Files.createTempDirectory("drift-sketch").toString
    Drift.sketch(base, "len", Seq("lang"), 20, 0d, 800d)
      .write.mode("overwrite").parquet(dir)
    val sketch = spark.read.parquet(dir)

    val viaSketch = Drift
      .compareWithBaseline(cur, sketch, "len", Seq("lang"), 20, 0d, 800d)
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("psi"), r.getAs[Double]("ks"))).toMap
    val direct = Drift.compare(cur, base, "len", Seq("lang"), 20, 0d, 800d)
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("psi"), r.getAs[Double]("ks"))).toMap
    assert(viaSketch === direct)
    // Same generator both halves → small drift (sampling noise only;
    // ~700 rows per lang per half puts KS noise at a few percent).
    viaSketch.values.foreach { case (psi, ks) => assert(psi < 0.1 && ks < 0.1) }
  }

  test("auto-binning: quantile edges are exact on a known grid; auto == explicit edges") {
    // values 0..100 → type-7 quartile positions are integral → edges
    // are exact data values, no interpolation arithmetic
    val base = spark.range(0, 101).select(lit("g").as("g"), col("id").cast("double").as("v"))
    val edges = Drift.quantileEdges(base, "v", nBins = 4, exact = true)
    assert(edges.toSeq === Seq(25.0, 50.0, 75.0))
    val cur = spark.range(0, 101).select(lit("g").as("g"),
      (col("id").cast("double") * 0.9 + 5).as("v"))
    val auto = Drift.compareAuto(cur, base, "v", Seq("g"), nBins = 4, exact = true)
      .collect().toSeq
    val explicit = Drift.compareWithEdges(cur, base, "v", Seq("g"), edges)
      .collect().toSeq
    assert(auto === explicit)
    // boundary semantics: bin = number of edges <= v (no clamping)
    val b = Drift.binsByEdges(
        Seq(("g", 24.999), ("g", 25.0), ("g", 100.0), ("g", -5.0)).toDF("g", "v"),
        "v", Seq("g"), edges)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(b === Map(0L -> 2L, 1L -> 1L, 3L -> 1L))
  }

  test("auto-binning: approx sketch edges track exact within tolerance") {
    val base = spark.range(0, 10000).select(lit("g").as("g"),
      pmod(col("id") * 37L, lit(1000L)).cast("double").as("v"))
    val exact = Drift.quantileEdges(base, "v", nBins = 5, exact = true)
    val approx = Drift.quantileEdges(base, "v", nBins = 5, exact = false)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 10d, s"approx edge $a far from exact $e")
    }
  }

  test("categorical drift: identical distributions score ~0; a shifted category is detected") {
    import spark.implicits._
    val a = Seq.fill(50)("s1") ++ Seq.fill(30)("s2") ++ Seq.fill(20)("s3")
    val b = Seq.fill(20)("s1") ++ Seq.fill(30)("s2") ++ Seq.fill(50)("s3")
    val cur = a.zipWithIndex.map { case (v, i) => (i, "g", v) }.toDF("id", "grp", "cat")
    val base = b.zipWithIndex.map { case (v, i) => (i, "g", v) }.toDF("id", "grp", "cat")

    val same = Drift.categoricalCompare(cur, cur, "cat", Seq("grp")).head()
    assert(same.getAs[Double]("psi") === 0.0)
    assert(same.getAs[Double]("tv") === 0.0)

    val shifted = Drift.categoricalCompare(cur, base, "cat", Seq("grp")).head()
    // TV = 0.5 * (|0.5-0.2| + 0 + |0.2-0.5|) = 0.3 exactly
    assert(shifted.getAs[Double]("tv") === 0.3)
    assert(shifted.getAs[Double]("psi") > 0.1)

    // a category absent from one side still contributes (full outer join)
    val extra = Seq((999, "g", "s9")).toDF("id", "grp", "cat")
    val withNew = Drift.categoricalCompare(cur.union(extra), cur, "cat", Seq("grp")).head()
    assert(withNew.getAs[Double]("tv") > 0.0)
  }
}
