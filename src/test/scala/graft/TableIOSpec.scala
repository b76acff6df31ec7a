package graft

import graft.sources.TableIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, LongType, StringType}
import java.nio.file.Files

class TableIOSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType)

  test("strict JSON load rejects malformed documents; permissive quarantines them") {
    val dir = Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(dir, "data.json")
    Files.writeString(f.toPath,
      """{"id": 1, "name": "ok"}
        |{"id": "not-a-number", "name": "bad"}
        |{"id": 3, "name": "ok2"}
        |""".stripMargin)

    val permissive = TableIO.readJson(spark, f.getPath, schema, strict = false)
    val rows = permissive.collect()
    assert(rows.length === 3)
    val corrupt = permissive.where($"_corrupt_record".isNotNull).collect()
    assert(corrupt.length === 1)
    assert(corrupt.head.getAs[Any]("id") === null) // bad row nulled, not thrown

    val strictDf = TableIO.readJson(spark, f.getPath, schema, strict = true)
    intercept[org.apache.spark.SparkException] { strictDf.collect() }
  }

  test("json column round-trip preserves values") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val back = TableIO.fromJsonColumn(TableIO.toJsonColumn(df), "json", schema)
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(back === Set((1L, "a"), (2L, "b")))
  }

  test("compact rewrites a many-file table into the byte-budgeted file count") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val df = spark.range(0L, 5000L, 1L, 20).toDF("id")
    df.write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before === 20)
    val n = TableIO.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(n === 1)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after === 1)
    // content identical
    val back = spark.read.parquet(dir).as[Long].collect().sorted
    assert(back.toSeq === (0L until 5000L))
  }

  test("compact preserves hive-partitioned layout and survives trailing slashes") {
    val dir = Files.createTempDirectory("graft-compact2").toString + "/t"
    val df = Seq((1L, "en"), (2L, "de"), (3L, "en"), (4L, "de")).toDF("id", "lang")
      .repartition(8)
    TableIO.writePartitioned(df, dir, Seq("lang"))
    // trailing slash must NOT nest the temp dir inside the table
    TableIO.compact(spark, dir + "/", targetFileBytes = 1L << 30)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(subdirs.toSet === Set("lang=de", "lang=en")) // layout kept
    val back = spark.read.parquet(dir).select($"id", $"lang")
      .as[(Long, String)].collect().toSet
    assert(back === Set((1L, "en"), (2L, "de"), (3L, "en"), (4L, "de")))
    // dynamic overwrite of one partition still works post-compaction
    TableIO.writePartitioned(Seq((9L, "en")).toDF("id", "lang"), dir, Seq("lang"))
    val after = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(after === Set((9L, "en"), (2L, "de"), (4L, "de")))
  }

  test("compact refuses sidecars, reports actual file counts, and detects a crashed swap") {
    // a non-parquet sidecar must block the rewrite, not be destroyed
    val dir = Files.createTempDirectory("graft-compact3").toString + "/t"
    spark.range(0L, 100L, 1L, 4).toDF("id").write.parquet(dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "manifest.json"), "{}")
    val e = intercept[IllegalArgumentException] {
      TableIO.compact(spark, dir, targetFileBytes = 1L << 30)
    }
    assert(e.getMessage.contains("manifest.json"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "manifest.json")))

    // hive-partitioned: returned count is the ACTUAL listing (one file
    // per partition value here — more than the byte-budget target of 1)
    val dir2 = Files.createTempDirectory("graft-compact4").toString + "/t"
    TableIO.writePartitioned(
      Seq((1L, "en"), (2L, "de"), (3L, "fr")).toDF("id", "lang").repartition(6),
      dir2, Seq("lang"))
    val n = TableIO.compact(spark, dir2, targetFileBytes = 1L << 30)
    val listed = java.nio.file.Files.walk(java.nio.file.Paths.get(dir2))
      .filter(p => p.toString.endsWith(".parquet")).count().toInt
    assert(n === listed && n === 3)

    // a stale .compact-old (crashed swap) blocks further compaction
    val aside = java.nio.file.Paths.get(dir2 + ".compact-old")
    java.nio.file.Files.createDirectory(aside)
    val e2 = intercept[IllegalArgumentException] {
      TableIO.compact(spark, dir2, targetFileBytes = 1L << 30)
    }
    assert(e2.getMessage.contains("compact-old"))
  }

  test("raw file ingestion: whole-file text rows feed the validator (S3)") {
    val dir = Files.createTempDirectory("graft-raw").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "Good.scala"),
      "object Good { val answer = 42 } // a perfectly reasonable file")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "bad.scala"), "x")

    val files = TableIO.readText(spark, s"$dir/*.scala")
    assert(files.columns.toSeq === Seq("path", "content"))
    assert(files.count() === 2)

    // The ingested rows validate like any other code-file table.
    val schema = graft.schema.Schema.of(
      "path" -> graft.schema.FieldSpec(required = true, regex = Some(".*\\.scala")),
      "content" -> graft.schema.FieldSpec(
        required = true, notEmpty = true, minLength = Some(10)))
    val v = graft.validate.Validator.violations(files, schema, Seq("path"))
      .collect()
      .map(r => (r.getAs[String]("path").split('/').last, r.getAs[String]("rule")))
    assert(v.toSet === Set(("bad.scala", "minlength")))
  }

  test("raw binary ingestion: (path, length, content) via binaryFile source") {
    val dir = Files.createTempDirectory("graft-bin").toString
    val payload = Array[Byte](0, 1, 2, -1, 127)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "blob.bin"), payload)
    val r = TableIO.readBinary(spark, s"$dir/*.bin").head()
    assert(r.getAs[String]("path").endsWith("blob.bin"))
    assert(r.getAs[Long]("length") === payload.length.toLong)
    assert(r.getAs[Array[Byte]]("content").toSeq === payload.toSeq)
  }

  test("partitioned write + dynamic overwrite is idempotent per partition") {
    val out = Files.createTempDirectory("graft-part").toString + "/t"
    val df = Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
    TableIO.writePartitioned(df, out, Seq("lang"))
    // Re-write ONLY the 'en' partition with new content.
    TableIO.writePartitioned(
      Seq((9L, "en")).toDF("id", "lang"), out, Seq("lang"))
    val back = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(back === Set((9L, "en"), (2L, "de"))) // de untouched, en replaced
  }

  test("bucketed write round-trips rows and join results exactly") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    val facts = (1L to 500L).map(i => (i % 37, i, s"v$i")).toDF("k", "id", "payload")
    val dims = (0L to 36L).map(k => (k, s"dim$k")).toDF("k", "name")
    try {
      TableIO.writeBucketed(facts, "tio_facts", s"$dir/facts", Seq("k"), 8, Seq("k"))
      TableIO.writeBucketed(dims, "tio_dims", s"$dir/dims", Seq("k"), 8, Seq("k"))
      val bf = spark.table("tio_facts")
      val bd = spark.table("tio_dims")
      assert(bf.count() === 500L)
      val bucketed = bf.join(bd, Seq("k"))
        .select($"k", $"id", $"payload", $"name")
      val plain = facts.join(dims, Seq("k"))
        .select($"k", $"id", $"payload", $"name")
      assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS tio_facts")
      spark.sql("DROP TABLE IF EXISTS tio_dims")
    }
  }
}
