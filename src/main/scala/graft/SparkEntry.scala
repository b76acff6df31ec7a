package graft

import graft.data.SynthGen
import graft.schema.{FieldSpec, Schema}
import graft.validate.Validator
import graft.verdict.Verdict
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry has a DuckDB-equivalent in `oracleSql` unless
  * the operator is not SQL-expressible (then the driver records a
  * rows-only check). Column names are aliased identically on both sides
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: full validation pipeline (rule DSL → Catalyst) over the
    * seeded synthetic code-file table — per-lang verdicts. rows > 0 by
    * construction (6 langs + the injected bad-lang partition).
    */
  def entry(spark: SparkSession): DataFrame = {
    val files = SynthGen.codeFiles(spark, SynthGen.Config(rows = 6000L))
    Verdict.compute(files, CodeFiles.schema, "lang")
  }

  // ---------------------------------------------------------------------
  // Shared fixtures over the driver testdata (TESTDATA.md).
  // ---------------------------------------------------------------------

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Cerberus-style schema over the driver `documents` table; thresholds
    * chosen so every rule kind fires on real rows at sf0.01.
    */
  private val docSchema = Schema.of(
    "doc_id" -> FieldSpec(required = true),
    "text" -> FieldSpec(
      required = true,
      notEmpty = true,
      minLength = Some(100),
      normalize = Some(trim(_))),
    "lang" -> FieldSpec(required = true, allowed = Some(Seq("de", "en", "es", "fr"))),
    "source" -> FieldSpec(required = true, regex = Some("src[0-9]{1,2}")),
    "n_chars" -> FieldSpec(required = true, min = Some(100d), max = Some(500d))
  )

  /** SQL body shared by the validate/verdict oracles: per-rule failure
    * predicates, mirroring RuleCompiler semantics exactly.
    */
  private val docRuleSql: Seq[(String, String, String, String)] = Seq(
    // (field, rule, failPredicate, valueExpr)
    ("doc_id", "required", "doc_id IS NULL", "CAST(NULL AS VARCHAR)"),
    ("text", "required", "text IS NULL", "CAST(NULL AS VARCHAR)"),
    ("text", "empty", "text IS NOT NULL AND trim(text) = ''", "trim(text)"),
    ("text", "minlength", "text IS NOT NULL AND length(trim(text)) < 100", "trim(text)"),
    ("lang", "required", "lang IS NULL", "CAST(NULL AS VARCHAR)"),
    ("lang", "allowed", "lang IS NOT NULL AND lang NOT IN ('de','en','es','fr')", "lang"),
    ("source", "required", "source IS NULL", "CAST(NULL AS VARCHAR)"),
    ("source", "regex", "source IS NOT NULL AND NOT regexp_full_match(source, 'src[0-9]{1,2}')", "source"),
    ("n_chars", "required", "n_chars IS NULL", "CAST(NULL AS VARCHAR)"),
    ("n_chars", "min", "n_chars IS NOT NULL AND n_chars < 100", "CAST(n_chars AS VARCHAR)"),
    ("n_chars", "max", "n_chars IS NOT NULL AND n_chars > 500", "CAST(n_chars AS VARCHAR)")
  )

  private val docViolationsSql: String = docRuleSql
    .map { case (f, r, pred, v) =>
      s"SELECT doc_id, '$f' AS field, '$r' AS rule, $v AS value FROM documents WHERE $pred"
    }
    .mkString(" UNION ALL ")

  private val docViolationCountSql: String = docRuleSql
    .map { case (_, _, pred, _) => s"(CASE WHEN $pred THEN 1 ELSE 0 END)" }
    .mkString(" + ")

  // ---------------------------------------------------------------------
  // Contract maps.
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_validate_documents" -> ((s, dir) =>
      Validator.violations(docs(s, dir), docSchema, Seq("doc_id"))),
    "q_verdict_documents" -> ((s, dir) =>
      Verdict.compute(docs(s, dir), docSchema, "lang")),
    "q_stats_lineitem" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          countDistinct(col("l_partkey")).as("distinct_parts"),
          round(sum(col("l_extendedprice")), 2).as("sum_price")))
  )

  def oracleSql: Map[String, String] = Map(
    "q_validate_documents" -> docViolationsSql,
    "q_verdict_documents" ->
      s"""SELECT lang, count(*) AS n_rows,
         | CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_rows,
         | CAST(SUM(v) AS BIGINT) AS n_violations,
         | SUM(v) = 0 AS pass
         |FROM (SELECT lang, $docViolationCountSql AS v FROM documents)
         |GROUP BY lang""".stripMargin,
    "q_stats_lineitem" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | count(DISTINCT l_partkey) AS distinct_parts,
        | round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
