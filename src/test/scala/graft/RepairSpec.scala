package graft

import graft.repair.Repair
import graft.schema.{FieldSpec, Schema}
import graft.validate.Validator
import org.apache.spark.sql.functions._

class RepairSpec extends SparkSpec {
  import spark.implicits._

  private def cellMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getAs[String]("rule"), r.getAs[String]("normalizer")) ->
        (r.getAs[Long]("n_violations"), r.getAs[Long]("n_repaired"),
          r.getAs[Long]("n_broken"))
    }.toMap

  test("repair counts match hand-counts; breakage is surfaced, nulls count nowhere") {
    // 2 clean, 2 uppercase (case-repairable), 1 padded (trim-repairable),
    // 1 hopeless, 1 null
    val df = Seq("de", "en", "DE", "FR", " es", "zz", null)
      .toDF("lang")
    val schema = Schema.of("lang" -> FieldSpec(
      regex = Some("[a-z]{2}"),
      allowed = Some(Seq("de", "en", "es", "fr"))))
    val out = cellMap(Repair.suggestRepairs(df, schema))
    // allowed violations: DE, FR, " es", zz (4); regex violations: only
    // the shape-broken three — zz IS two lowercase letters (3).
    // trim_lower repairs every shape violation, breaks nothing; the
    // hopeless zz stays an allowed violation.
    assert(out(("allowed", "trim_lower")) === ((4L, 3L, 0L)))
    assert(out(("regex", "trim_lower")) === ((3L, 3L, 0L)))
    // lower fixes case variants only; trim fixes the padded one only
    assert(out(("allowed", "lower")) === ((4L, 2L, 0L)))
    assert(out(("allowed", "trim")) === ((4L, 1L, 0L)))
    // upper repairs nothing and BREAKS both passing rows
    assert(out(("allowed", "upper")) === ((4L, 0L, 2L)))
    // adopting the winning candidate eliminates exactly the repaired
    // violations when re-validating
    val adopted = Schema.of("lang" -> FieldSpec(
      regex = Some("[a-z]{2}"),
      allowed = Some(Seq("de", "en", "es", "fr")),
      normalize = Some(c => lower(trim(c)))))
    assert(Validator.violations(df.withColumn("id", lit(1)), adopted,
      Seq("id")).count() === 1) // only zz's allowed violation survives
  }

  test("candidates compose AFTER a declared normalize; misconfig throws") {
    val df = Seq(" DE ", "de").toDF("lang")
    val schema = Schema.of("lang" -> FieldSpec(
      allowed = Some(Seq("de")),
      normalize = Some(trim(_))))
    val out = cellMap(Repair.suggestRepairs(df, schema))
    // baseline already trims: 1 violation ("DE"); lower on TOP repairs it
    assert(out(("allowed", "lower")) === ((1L, 1L, 0L)))
    // trim on top of trim changes nothing
    assert(out(("allowed", "trim")) === ((1L, 0L, 0L)))
    assertThrows[IllegalArgumentException] {
      Repair.suggestRepairs(df, Schema.of("lang" -> FieldSpec(required = true)))
    }
    assertThrows[IllegalArgumentException] {
      Repair.suggestRepairs(df, schema, candidates = Map.empty)
    }
    // a typo'd field is a loud misconfiguration, never a silent skip
    assertThrows[IllegalArgumentException] {
      Repair.suggestRepairs(df, Schema.of(
        "lang" -> FieldSpec(allowed = Some(Seq("de"))),
        "lagn" -> FieldSpec(allowed = Some(Seq("de")))))
    }
    assertThrows[IllegalArgumentException] {
      Repair.suggestRepairs(df, Schema.of(
        "meta.lang" -> FieldSpec(allowed = Some(Seq("de")))))
    }
  }

  test("grouped repairs equal per-group filters of the corpus") {
    val df = Seq(("s1", "de"), ("s1", "DE"), ("s2", "de"), ("s2", " de"),
      ("s2", "zz")).toDF("src", "lang")
    val schema = Schema.of("lang" -> FieldSpec(allowed = Some(Seq("de"))))
    val grouped = Repair.suggestRepairs(df, schema, groupCols = Seq("src"))
      .collect().map { r =>
        (r.getAs[String]("src"), r.getAs[String]("normalizer")) ->
          (r.getAs[Long]("n_violations"), r.getAs[Long]("n_repaired"))
      }.toMap
    // per-group counts equal running the global report on each slice
    assert(grouped(("s1", "lower")) === ((1L, 1L)))   // DE → de
    assert(grouped(("s2", "lower")) === ((2L, 0L)))   // " de", zz: not case
    assert(grouped(("s2", "trim")) === ((2L, 1L)))    // " de" → de
    assert(grouped(("s1", "trim")) === ((1L, 0L)))
  }

  test("non-string columns and array contains rules are out of the repair domain") {
    val df = Seq((1L, Seq("a", "b"), "de")).toDF("n", "tags", "lang")
    // contains is array-typed — its cells are excluded, not crashed on;
    // numeric fields induce no rows (normalizers are string functions)
    val out = Repair.suggestRepairs(df, Schema.of(
      "n" -> FieldSpec(min = Some(0d)),
      "tags" -> FieldSpec(contains = Some(Seq("a")), minLength = Some(1)),
      "lang" -> FieldSpec(allowed = Some(Seq("de")))))
    val rules = out.select("field", "rule").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!rules.exists(_._2 == "contains"))
    assert(!rules.exists(_._1 == "n"))
    assert(!rules.exists(_._1 == "tags")) // array column: not a string field
    assert(rules.contains(("lang", "allowed")))
  }
}
