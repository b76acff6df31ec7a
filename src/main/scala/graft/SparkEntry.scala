package graft

import graft.data.SynthGen
import graft.drift.Drift
import graft.refint.RefIntegrity
import graft.schema.{FieldSpec, Schema}
import graft.stats.ColumnStats
import graft.unique.Uniqueness
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
          round(sum(col("l_extendedprice")), 2).as("sum_price"))),
    "q_stats_documents" -> ((s, dir) =>
      ColumnStats
        .compute(docs(s, dir), Seq("text", "source", "n_chars"),
          groupCols = Seq("lang"), exact = true)
        .withColumnRenamed("column", "col_name")
        .withColumn("null_rate", round(col("null_rate"), 6))
        .withColumn("avg_len", round(col("avg_len"), 4))),
    "q_hll_documents" -> ((s, dir) =>
      // HLL++ distinct — the 100 TB path; no SQL oracle (approximate),
      // accuracy pinned vs exact in StatsSpec instead.
      ColumnStats.compute(docs(s, dir), Seq("text", "source"),
        groupCols = Seq("lang"), exact = false)
        .withColumnRenamed("column", "col_name")
        .select("lang", "col_name", "n_rows", "n_distinct")),
    "q_unique_lineitem" -> ((s, dir) =>
      Uniqueness.summary(
        s.read.parquet(s"$dir/lineitem.parquet"),
        Seq("l_orderkey", "l_linenumber"))),
    "q_dups_events" -> ((s, dir) =>
      Uniqueness.duplicates(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("user_id", "event_type"))),
    "q_ri_orders_customer" -> ((s, dir) =>
      RefIntegrity.summary(
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"))),
    "q_drift_documents" -> ((s, dir) =>
      Drift.againstGlobal(docs(s, dir), "n_chars", Seq("lang"),
        nBins = 20, lo = 0d, hi = 600d)),
    "q_drift_events" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      Drift.compare(
        ev.where(pmod(col("event_id"), lit(2)) === 0),
        ev.where(pmod(col("event_id"), lit(2)) === 1),
        "value", Seq("event_type"), nBins = 25, lo = 0d, hi = 500d)
    })
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
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_stats_documents" -> Seq("text", "source", "n_chars").map { c =>
      s"""SELECT lang, '$c' AS col_name, count(*) AS n_rows,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         | round(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS null_rate,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min, CAST(max($c) AS VARCHAR) AS max,
         | round(avg(length(CAST($c AS VARCHAR))), 4) AS avg_len
         |FROM documents GROUP BY lang""".stripMargin
    }.mkString(" UNION ALL "),
    "q_unique_lineitem" ->
      """SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
        | CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
        | CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_rows
        |FROM (SELECT count(*) AS n FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber)""".stripMargin,
    "q_dups_events" ->
      """SELECT * FROM (
        | SELECT *, count(*) OVER (PARTITION BY user_id, event_type) AS dup_count
        | FROM events) WHERE dup_count > 1""".stripMargin,
    "q_ri_orders_customer" ->
      """SELECT (SELECT count(*) FROM orders) AS n_rows,
        | (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_null_keys,
        | (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |   AND NOT EXISTS (SELECT 1 FROM customer c
        |                   WHERE c.c_custkey = o.o_custkey)) AS n_orphans""".stripMargin,
    "q_drift_documents" ->
      """WITH cur AS (
        |  SELECT lang,
        |   CAST(least(greatest(floor(CAST(n_chars AS DOUBLE) / 30.0), 0), 19) AS BIGINT) AS bin,
        |   count(*) AS n_cur
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |base AS (
        |  SELECT
        |   CAST(least(greatest(floor(CAST(n_chars AS DOUBLE) / 30.0), 0), 19) AS BIGINT) AS bin,
        |   count(*) AS n_base
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |grid AS (
        |  SELECT l.lang, b.bin, b.n_base
        |  FROM (SELECT DISTINCT lang FROM cur) l CROSS JOIN base b),
        |j AS (
        |  SELECT g.lang, g.bin, CAST(coalesce(c.n_cur, 0) AS BIGINT) AS n_cur, g.n_base
        |  FROM grid g LEFT JOIN cur c ON c.lang = g.lang AND c.bin = g.bin),
        |f AS (
        |  SELECT lang, bin, n_cur, n_base,
        |   n_cur / CAST(sum(n_cur) OVER (PARTITION BY lang) AS DOUBLE) AS p,
        |   n_base / CAST(sum(n_base) OVER (PARTITION BY lang) AS DOUBLE) AS q
        |  FROM j),
        |t AS (
        |  SELECT lang, bin, n_cur, n_base, p, q,
        |   (greatest(p, 1e-6) - greatest(q, 1e-6)) * ln(greatest(p, 1e-6) / greatest(q, 1e-6)) AS psi_term,
        |   sum(p) OVER (PARTITION BY lang ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cdf_p,
        |   sum(q) OVER (PARTITION BY lang ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cdf_q
        |  FROM f)
        |SELECT lang, CAST(sum(n_cur) AS BIGINT) AS n_cur,
        | CAST(sum(n_base) AS BIGINT) AS n_base,
        | round(sum(psi_term), 6) AS psi,
        | round(max(abs(cdf_p - cdf_q)), 6) AS ks
        |FROM t GROUP BY lang""".stripMargin,
    "q_drift_events" ->
      """WITH cur AS (
        |  SELECT event_type,
        |   CAST(least(greatest(floor(CAST(value AS DOUBLE) / 20.0), 0), 24) AS BIGINT) AS bin,
        |   count(*) AS n_cur
        |  FROM events WHERE value IS NOT NULL AND event_id % 2 = 0 GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type,
        |   CAST(least(greatest(floor(CAST(value AS DOUBLE) / 20.0), 0), 24) AS BIGINT) AS bin,
        |   count(*) AS n_base
        |  FROM events WHERE value IS NOT NULL AND event_id % 2 = 1 GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(cur.event_type, base.event_type) AS event_type,
        |   coalesce(cur.bin, base.bin) AS bin,
        |   CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
        |   CAST(coalesce(n_base, 0) AS BIGINT) AS n_base
        |  FROM cur FULL OUTER JOIN base
        |   ON cur.event_type = base.event_type AND cur.bin = base.bin),
        |f AS (
        |  SELECT event_type, bin, n_cur, n_base,
        |   n_cur / CAST(sum(n_cur) OVER (PARTITION BY event_type) AS DOUBLE) AS p,
        |   n_base / CAST(sum(n_base) OVER (PARTITION BY event_type) AS DOUBLE) AS q
        |  FROM j),
        |t AS (
        |  SELECT event_type, bin, n_cur, n_base, p, q,
        |   (greatest(p, 1e-6) - greatest(q, 1e-6)) * ln(greatest(p, 1e-6) / greatest(q, 1e-6)) AS psi_term,
        |   sum(p) OVER (PARTITION BY event_type ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cdf_p,
        |   sum(q) OVER (PARTITION BY event_type ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cdf_q
        |  FROM f)
        |SELECT event_type, CAST(sum(n_cur) AS BIGINT) AS n_cur,
        | CAST(sum(n_base) AS BIGINT) AS n_base,
        | round(sum(psi_term), 6) AS psi,
        | round(max(abs(cdf_p - cdf_q)), 6) AS ks
        |FROM t GROUP BY event_type""".stripMargin
  )
}
