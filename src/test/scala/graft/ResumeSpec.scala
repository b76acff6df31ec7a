package graft

import graft.data.SynthGen
import graft.resume.{Checkpoint, ValidationRun}
import graft.validate.Validator
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ResumeSpec extends SparkSpec {

  private val cfg = SynthGen.Config(rows = 4000L, partitions = 4)
  private def files = SynthGen.codeFiles(spark, cfg)
  private def tmp() = Files.createTempDirectory("graft-resume").toString

  test("fresh run commits every partition; second run is a no-op") {
    val out = tmp()
    val r1 = ValidationRun.run(files, CodeFiles.schema, "lang", CodeFiles.keyCols, out)
    assert(r1.pending.nonEmpty)
    val manifest = Checkpoint.processed(spark, out)
    assert(manifest.count() === r1.pending.size.toLong)
    val r2 = ValidationRun.run(files, CodeFiles.schema, "lang", CodeFiles.keyCols, out)
    assert(r2.pending.isEmpty && r2.skipped === r1.pending.size.toLong)
  }

  test("resume processes only uncommitted partitions; results match a single run") {
    val single = tmp()
    ValidationRun.run(files, CodeFiles.schema, "lang", CodeFiles.keyCols, single)

    // Interrupted run: only two partitions got through before the "crash".
    val resumed = tmp()
    val firstSlice = files.where(col("lang").isin("scala", "java"))
    val r1 = ValidationRun.run(firstSlice, CodeFiles.schema, "lang", CodeFiles.keyCols, resumed)
    assert(r1.pending.toSet === Set("scala", "java"))

    // Resume over the FULL input: already-committed partitions skipped.
    val r2 = ValidationRun.run(files, CodeFiles.schema, "lang", CodeFiles.keyCols, resumed)
    assert(!r2.pending.contains("scala") && !r2.pending.contains("java"))
    assert(r2.pending.nonEmpty)

    // Violations identical between one-shot and resumed runs.
    val a = spark.read.parquet(s"$single/violations")
      .select("repo", "path", "commit", "lang", "field", "rule", "value")
    val b = spark.read.parquet(s"$resumed/violations")
      .select("repo", "path", "commit", "lang", "field", "rule", "value")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // Manifest lineage: one committed row per partition, all runs traced.
    val m = Checkpoint.processed(spark, resumed)
    assert(m.select("partition").distinct().count() === m.count())
    assert(m.select("run_id").distinct().count() === 2)
  }

  test("violations output equals direct Validator on the same input") {
    val out = tmp()
    ValidationRun.run(files, CodeFiles.schema, "lang", CodeFiles.keyCols, out)
    val written = spark.read.parquet(s"$out/violations")
      .select("repo", "path", "commit", "field", "rule", "value", "severity")
    val direct = Validator.violations(files, CodeFiles.schema, CodeFiles.keyCols)
      .select("repo", "path", "commit", "field", "rule", "value", "severity")
    assert(written.exceptAll(direct).isEmpty && direct.exceptAll(written).isEmpty)
  }

  test("null partition values are tracked via sentinel and resumed correctly") {
    import spark.implicits._
    val out = tmp()
    val df = Seq(("a", "x", "en"), ("b", null, "en"), ("c", "y", null))
      .toDF("id", "name", "lang")
    val schema = graft.schema.Schema.of(
      "name" -> graft.schema.FieldSpec(required = true))
    val r1 = ValidationRun.run(df, schema, "lang", Seq("id"), out)
    assert(r1.pending.toSet === Set("en", Checkpoint.NullPartitionToken))
    val r2 = ValidationRun.run(df, schema, "lang", Seq("id"), out)
    assert(r2.pending.isEmpty)
  }
}
