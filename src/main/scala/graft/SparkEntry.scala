package graft

import graft.data.SynthGen
import graft.dedup.Dedup
import graft.drift.Drift
import graft.multimodal.Multimodal
import graft.refint.RefIntegrity
import graft.schema.{FieldSpec, Schema, SchemaJson}
import graft.sim.Similarity
import graft.stats.ColumnStats
import graft.text.TextAnalysis
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

  /** Driver `documents` table + one derived string column (`size_tag`)
    * that is numeric for normal docs and tagged ("~553") for oversized
    * ones — gives the Cerberus `type` rule a selectively-failing target
    * (all base columns are homogeneously typed). Mirrored exactly by
    * [[docsXSql]].
    */
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .withColumn("size_tag",
        when(col("n_chars") > 500, concat(lit("~"), col("n_chars")))
          .otherwise(col("n_chars").cast("string")))

  private val docsXSql: String =
    """(SELECT *,
      |  CASE WHEN n_chars > 500 THEN '~' || CAST(n_chars AS VARCHAR)
      |       ELSE CAST(n_chars AS VARCHAR) END AS size_tag
      | FROM documents) docs_x""".stripMargin

  /** Cerberus-style schema over the driver `documents` table; thresholds
    * chosen so every rule kind — including `type`, `dependencies`, and
    * the warning severity channel — fires on real rows at sf0.01.
    */
  private val docSchema = Schema.of(
    "doc_id" -> FieldSpec(required = true),
    "text" -> FieldSpec(
      required = true,
      notEmpty = true,
      minLength = Some(100),
      normalize = Some(trim(_)),
      // short-but-present text is a quality smell, not a hard failure:
      // report on the warning channel (reference's 3-channel outcome
      // mapping, app/.../HomeViewModel.kt:179-185)
      ruleSeverity = Map("minlength" -> graft.schema.Severity.Warning)),
    "lang" -> FieldSpec(required = true, allowed = Some(Seq("de", "en", "es", "fr"))),
    "source" -> FieldSpec(
      required = true,
      regex = Some("src[0-9]{1,2}"),
      // Cerberus `forbidden` — the deny-list complement of `allowed`
      // (a known-bad scrape source)
      forbidden = Some(Seq("src13")),
      // cross-field `dependencies` (reference cross-field check,
      // app/.../MainActivity.kt:534-535): source attribution is only
      // meaningful for the four supported European langs
      dependencies = Map("lang" -> Seq("de", "en", "es", "fr"))),
    "n_chars" -> FieldSpec(required = true, min = Some(100d), max = Some(500d)),
    "size_tag" -> FieldSpec(
      required = true,
      // Cerberus `type` rule (strict-schema rejection, rust/src/lib.rs:
      // 81-83): the tag must parse as an integer
      dtype = Some(org.apache.spark.sql.types.LongType))
  )

  /** Normalization-half schema for q_normalize_documents: one of each
    * normalization action over the documents table — rename, literal
    * default, computed default (absent column), declared coercion;
    * purge_unknown drops the undeclared size_tag.
    */
  private val normSchema = Schema.of(
    "doc_id" -> FieldSpec(required = true),
    "text" -> FieldSpec(normalize = Some(trim(_))),
    "lang" -> FieldSpec(),
    // region_hint is derived NULLABLE in the query input (null for
    // oversized docs), so the literal-default injection fires on real
    // rows and the oracle replays it
    "region_hint" -> FieldSpec(default = Some("unknown")),
    "source" -> FieldSpec(rename = Some("origin")),
    "n_chars" -> FieldSpec(),
    "quality_bucket" -> FieldSpec(defaultSetter =
      Some(when(col("n_chars") > 300, "long").otherwise("short"))))

  /** q_normalize input: documents + a derived NULLABLE column (null
    * for oversized docs) so the literal-default injection fires on
    * real rows — the raw table has no nulls at sf0.01.
    */
  private def docsForNormalize(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("region_hint",
      when(col("n_chars") <= 500, col("lang")))

  /** q_normalize_nested input: documents + a `meta` struct — null on
    * the doc_id%31 slice (pins the parent-null no-inject semantics on
    * real rows), `region` null for oversized docs (the dotted default
    * fires), `size` carried through untouched.
    */
  private def docsNested(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("meta",
      when(pmod(col("doc_id"), lit(31)) =!= 0,
        struct(
          when(col("n_chars") <= 500, col("lang")).as("region"),
          col("n_chars").as("size"))))

  /** Struct-path normalization schema: a dotted default + coercion on
    * an existing struct field, and a dotted default CREATING a new
    * struct field — both rebuilt in place via withField.
    */
  private val nestedNormSchema = Schema.of(
    "doc_id" -> FieldSpec(),
    "meta.region" -> FieldSpec(default = Some("unknown"),
      normalize = Some(upper(_))),
    "meta.origin_tag" -> FieldSpec(default = Some("none")))

  /** q_normalize_elements input: accounts array with a NULLABLE element
    * field (element 1's `n` is null for oversized docs) so the
    * per-element default fires on real rows.
    */
  private def docsAccountsNullable(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      array(
        struct(col("source").as("name"), col("n_chars").as("n")),
        struct(col("lang").as("name"),
          when(col("n_chars") <= 500, col("n_chars") - 200).as("n")))
        .as("accounts"))

  /** Per-element normalization: coercion (upper names) + literal
    * default (null n → 0) inside every array element.
    */
  private val elemNormSchema = Schema.of(
    "name" -> FieldSpec(normalize = Some(upper(_))),
    "n" -> FieldSpec(default = Some(0L)))

  /** Positional `items` schema for q_validate_items_documents: slot 0
    * source-shaped, slot 1 language allow-list, slot 2 integer-parseable
    * (size_tag's '~nnn' oversize tag fails it).
    */
  private val itemsSchema = Schema.of(
    "attrs" -> FieldSpec(items = Seq(
      FieldSpec(regex = Some("src[0-9]{1,2}")),
      FieldSpec(allowed = Some(Seq("de", "en", "es", "fr"))),
      FieldSpec(dtype = Some(org.apache.spark.sql.types.LongType)))))

  /** SQL body shared by the validate/verdict oracles: per-rule failure
    * predicates + severity, mirroring RuleCompiler semantics exactly.
    */
  private val docRuleSql: Seq[(String, String, String, String, String)] = Seq(
    // (field, rule, failPredicate, valueExpr, severity)
    ("doc_id", "required", "doc_id IS NULL", "CAST(NULL AS VARCHAR)", "error"),
    ("text", "required", "text IS NULL", "CAST(NULL AS VARCHAR)", "error"),
    ("text", "empty", "text IS NOT NULL AND trim(text) = ''", "trim(text)", "error"),
    ("text", "minlength", "text IS NOT NULL AND length(trim(text)) < 100", "trim(text)", "warning"),
    ("lang", "required", "lang IS NULL", "CAST(NULL AS VARCHAR)", "error"),
    ("lang", "allowed", "lang IS NOT NULL AND lang NOT IN ('de','en','es','fr')", "lang", "error"),
    ("source", "required", "source IS NULL", "CAST(NULL AS VARCHAR)", "error"),
    ("source", "regex", "source IS NOT NULL AND NOT regexp_full_match(source, 'src[0-9]{1,2}')", "source", "error"),
    ("source", "forbidden", "source IS NOT NULL AND source IN ('src13')", "source", "error"),
    ("source", "dependencies", "source IS NOT NULL AND (lang IS NULL OR lang NOT IN ('de','en','es','fr'))", "source", "error"),
    ("n_chars", "required", "n_chars IS NULL", "CAST(NULL AS VARCHAR)", "error"),
    ("n_chars", "min", "n_chars IS NOT NULL AND n_chars < 100", "CAST(n_chars AS VARCHAR)", "error"),
    ("n_chars", "max", "n_chars IS NOT NULL AND n_chars > 500", "CAST(n_chars AS VARCHAR)", "error"),
    ("size_tag", "required", "size_tag IS NULL", "CAST(NULL AS VARCHAR)", "error"),
    ("size_tag", "type", "size_tag IS NOT NULL AND TRY_CAST(size_tag AS BIGINT) IS NULL", "size_tag", "error")
  )

  /** q_validate_json schema — a JSON DOCUMENT, not Scala: exercises the
    * SchemaJson parse path end-to-end (registry normalizer by name,
    * array-form dependencies, rule_severity, fatal channel, oneof).
    * Thresholds differ from [[docSchema]] so the two queries cannot
    * mask each other. Mirrored rule-for-rule by its oracle.
    */
  private val jsonDocSchema: String =
    """{
      | "doc_id":  {"required": true},
      | "lang":    {"required": true, "normalize": "upper",
      |             "allowed": ["DE", "EN", "ES", "FR"],
      |             "rule_severity": {"allowed": "warning"}},
      | "source":  {"regex": "src[0-9]{1,2}", "forbidden": ["src13"],
      |             "dependencies": ["lang"]},
      | "text":    {"empty": false, "minlength": 120},
      | "n_chars": {"min": 150, "max": 450,
      |             "oneof": [{"max": 250}, {"min": 400}]},
      | "size_tag": {"type": "bigint", "severity": "fatal"}
      |}""".stripMargin

  /** Oracle for `q_validate_json_documents`: the JSON-authored rules
    * replayed predicate-for-predicate (normalize-before-validate shows
    * as upper(lang) in both the allowed predicate and the reported
    * value; `empty` trims per the engine's empty semantics).
    */
  private val jsonValidateSql: String = Seq(
    ("doc_id", "required", "doc_id IS NULL", "CAST(NULL AS VARCHAR)", "error"),
    ("lang", "required", "lang IS NULL", "CAST(NULL AS VARCHAR)", "error"),
    ("lang", "allowed",
      "lang IS NOT NULL AND upper(lang) NOT IN ('DE','EN','ES','FR')",
      "upper(lang)", "warning"),
    ("source", "regex",
      "source IS NOT NULL AND NOT regexp_full_match(source, 'src[0-9]{1,2}')",
      "source", "error"),
    ("source", "forbidden", "source IS NOT NULL AND source IN ('src13')",
      "source", "error"),
    ("source", "dependencies", "source IS NOT NULL AND lang IS NULL",
      "source", "error"),
    ("text", "empty", "text IS NOT NULL AND trim(text) = ''", "text", "error"),
    ("text", "minlength", "text IS NOT NULL AND length(text) < 120",
      "text", "error"),
    ("n_chars", "min", "n_chars IS NOT NULL AND n_chars < 150",
      "CAST(n_chars AS VARCHAR)", "error"),
    ("n_chars", "max", "n_chars IS NOT NULL AND n_chars > 450",
      "CAST(n_chars AS VARCHAR)", "error"),
    ("n_chars", "oneof",
      """n_chars IS NOT NULL AND
        | (CASE WHEN n_chars <= 250 THEN 1 ELSE 0 END +
        |  CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) <> 1""".stripMargin,
      "CAST(n_chars AS VARCHAR)", "error"),
    ("size_tag", "type",
      "size_tag IS NOT NULL AND TRY_CAST(size_tag AS BIGINT) IS NULL",
      "size_tag", "fatal"))
    .map { case (f, r, pred, v, sev) =>
      s"SELECT doc_id, '$f' AS field, '$r' AS rule, $v AS value, '$sev' AS severity FROM $docsXSql WHERE $pred"
    }
    .mkString(" UNION ALL ")

  /** Oracle for `q_suggested_expectations_documents`: the induction
    * formulas (Expectations.suggest scaladoc) as base-slice stats, the
    * evaluation as current-slice stats, both single-row CTEs; the
    * conditional rules' presence guards are WHERE clauses over the
    * base stats. Tolerance constants are CAST to DOUBLE so DuckDB's
    * decimal literals don't change the arithmetic.
    */
  private val suggestedExpectationsSql: String = {
    val numCols = Seq("doc_id", "n_chars")
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    def stats(src: String): String = {
      val per = cols.flatMap { f =>
        Seq(
          s"avg(CASE WHEN $f IS NULL THEN 1.0 ELSE 0.0 END) AS nf_$f",
          s"CAST(count(DISTINCT $f) AS DOUBLE) AS d_$f") ++
          (if (numCols.contains(f)) Seq(
            s"avg(CAST($f AS DOUBLE)) AS mean_$f",
            s"min(CAST($f AS DOUBLE)) AS mn_$f",
            s"max(CAST($f AS DOUBLE)) AS mx_$f")
           else Nil)
      }
      s"SELECT CAST(count(*) AS DOUBLE) AS n, ${per.mkString(", ")} FROM $src"
    }
    def arm(check: String, column: String, obs: String, lo: String,
        hi: String, guard: String = "TRUE"): String =
      s"""SELECT '$check' AS "check", '$column' AS "column",
         | CAST(NULL AS DOUBLE) AS q, $obs AS observed, $lo AS lo,
         | $hi AS hi FROM b, c WHERE $guard""".stripMargin
    val inf = "CAST('inf' AS DOUBLE)"
    val ninf = "CAST('-inf' AS DOUBLE)"
    val t = "CAST(0.25 AS DOUBLE)"
    val arms =
      Seq(arm("row_count", "", "c.n",
        "b.n * CAST(0.75 AS DOUBLE)", "b.n * CAST(1.25 AS DOUBLE)")) ++
        cols.flatMap { f =>
          Seq(
            arm("null_frac", f, s"c.nf_$f", "0.0",
              s"least(CAST(1 AS DOUBLE), b.nf_$f + $t)"),
            arm("unique_frac", f, s"c.d_$f / c.n", "1.0", inf,
              guard = s"b.d_$f = b.n AND b.nf_$f = 0"),
            arm("distinct", f, s"c.d_$f", ninf, s"b.d_$f",
              guard = s"b.d_$f >= 1 AND b.d_$f <= 20")) ++
            (if (numCols.contains(f)) Seq(
              arm("mean", f, s"c.mean_$f",
                s"b.mean_$f - $t * (b.mx_$f - b.mn_$f)",
                s"b.mean_$f + $t * (b.mx_$f - b.mn_$f)",
                guard = s"b.mean_$f IS NOT NULL"),
              arm("min", f, s"c.mn_$f",
                s"b.mn_$f - $t * (b.mx_$f - b.mn_$f)", inf,
                guard = s"b.mean_$f IS NOT NULL"),
              arm("max", f, s"c.mx_$f", ninf,
                s"b.mx_$f + $t * (b.mx_$f - b.mn_$f)",
                guard = s"b.mean_$f IS NOT NULL"))
             else Nil)
        }
    s"""WITH base AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
       | cur AS (SELECT doc_id, text, lang, source, n_chars + 200 AS n_chars
       |   FROM documents WHERE doc_id % 2 <> 0),
       | b AS (${stats("base")}),
       | c AS (${stats("cur")})
       |SELECT "check", "column", q, observed, lo, hi,
       | coalesce(observed >= lo AND observed <= hi, FALSE) AS pass
       |FROM (${arms.mkString(" UNION ALL ")})""".stripMargin
  }

  private val docViolationsSql: String = docRuleSql
    .map { case (f, r, pred, v, sev) =>
      s"SELECT doc_id, '$f' AS field, '$r' AS rule, $v AS value, '$sev' AS severity FROM $docsXSql WHERE $pred"
    }
    .mkString(" UNION ALL ")

  /** Oracle for `q_induced_validate_documents`: replay the INDUCTION
    * (every bound a scalar subquery over the base slice, every
    * conditional rule guarded by the same condition `suggestSchema`
    * uses — required iff the base has no nulls, `allowed` iff exact
    * cardinality ≤ 20 and the base is non-empty) and then the
    * validation of the odd half, rule for rule.
    */
  private val inducedValidateSql: String = {
    def row(f: String, r: String, v: String, pred: String) =
      s"SELECT doc_id, '$f' AS field, '$r' AS rule, $v AS value, 'error' AS severity FROM cur WHERE $pred"
    def required(f: String) = row(f, "required", "CAST(NULL AS VARCHAR)",
      s"$f IS NULL AND (SELECT count(*) - count($f) FROM base) = 0")
    def numeric(f: String) = Seq(
      required(f),
      row(f, "min", s"CAST($f AS VARCHAR)",
        s"$f IS NOT NULL AND $f < (SELECT min($f) FROM base)"),
      row(f, "max", s"CAST($f AS VARCHAR)",
        s"$f IS NOT NULL AND $f > (SELECT max($f) FROM base)"))
    def stringy(f: String) = Seq(
      required(f),
      row(f, "allowed", f,
        s"$f IS NOT NULL AND (SELECT count($f) FROM base) > 0" +
          s" AND (SELECT count(DISTINCT $f) FROM base) <= 20" +
          s" AND $f NOT IN (SELECT $f FROM base WHERE $f IS NOT NULL)"),
      row(f, "minlength", f,
        s"$f IS NOT NULL AND length($f) < (SELECT min(length($f)) FROM base)"),
      row(f, "maxlength", f,
        s"$f IS NOT NULL AND length($f) > (SELECT max(length($f)) FROM base)"))
    "WITH base AS (SELECT * FROM documents WHERE doc_id % 3 = 0),\n" +
      "cur AS (SELECT * FROM documents WHERE doc_id % 3 <> 0)\n" +
      (numeric("doc_id") ++ numeric("n_chars") ++
        stringy("text") ++ stringy("lang") ++ stringy("source"))
        .mkString("\nUNION ALL\n")
  }

  /** Oracle for `q_repairs_documents`: every (rule × candidate) cell's
    * before/after predicates replayed — baseline fails, fails-after-
    * candidate, and the repaired/broken deltas, summed over the same
    * noisy derived column.
    */
  private def repairsSqlFor(grouped: Boolean): String = {
    val allowed = "('de','en','es','fr')"
    def f0(rule: String, v: String) = rule match {
      case "regex" => s"($v IS NOT NULL AND NOT regexp_full_match($v, '[a-z]{2}'))"
      case "allowed" => s"($v IS NOT NULL AND $v NOT IN $allowed)"
    }
    val cands = Seq(
      "lower" -> "lower(v)",
      "trim" -> "trim(v)",
      "trim_lower" -> "lower(trim(v))",
      "trim_upper" -> "upper(trim(v))",
      "upper" -> "upper(v)")
    val (groupSel, groupBy) =
      if (grouped) ("lang, ", " GROUP BY lang") else ("", "")
    val cells = for {
      rule <- Seq("regex", "allowed")
      (name, expr) <- cands
    } yield {
      val before = f0(rule, "v")
      val after = f0(rule, expr)
      s"""SELECT $groupSel'lang2' AS field, '$rule' AS rule, '$name' AS normalizer,
         | CAST(sum(CASE WHEN $before THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         | CAST(sum(CASE WHEN $before AND NOT $after THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired,
         | CAST(sum(CASE WHEN NOT $before AND $after THEN 1 ELSE 0 END) AS BIGINT) AS n_broken
         |FROM d$groupBy""".stripMargin
    }
    """WITH d AS (SELECT lang, CASE WHEN doc_id % 3 = 0 THEN upper(lang)
      |                       WHEN doc_id % 3 = 1 THEN ' ' || lang
      |                       ELSE lang END AS v
      |           FROM documents)
      |""".stripMargin + cells.mkString("\nUNION ALL\n")
  }

  private val repairsSql: String = repairsSqlFor(grouped = false)

  /** Oracle for `q_schema_merge_documents`: both inductions AND the
    * widening replayed — every merged bound is least/greatest of the
    * two slices' scalar subqueries, merged `required` demands zero
    * nulls in BOTH slices, and the merged `allowed` set is the UNION
    * of the slices' values under both cardinality caps.
    */
  private val schemaMergeSql: String = {
    def row(f: String, r: String, v: String, pred: String) =
      s"SELECT doc_id, '$f' AS field, '$r' AS rule, $v AS value, 'error' AS severity FROM cur WHERE $pred"
    def present(f: String) =
      s"(SELECT count($f) FROM a) > 0 AND (SELECT count($f) FROM b) > 0"
    def required(f: String) = row(f, "required", "CAST(NULL AS VARCHAR)",
      s"$f IS NULL AND (SELECT count(*) - count($f) FROM a) = 0" +
        s" AND (SELECT count(*) - count($f) FROM b) = 0")
    def numeric(f: String) = Seq(
      required(f),
      row(f, "min", s"CAST($f AS VARCHAR)",
        s"$f IS NOT NULL AND ${present(f)} AND " +
          s"$f < least((SELECT min($f) FROM a), (SELECT min($f) FROM b))"),
      row(f, "max", s"CAST($f AS VARCHAR)",
        s"$f IS NOT NULL AND ${present(f)} AND " +
          s"$f > greatest((SELECT max($f) FROM a), (SELECT max($f) FROM b))"))
    def stringy(f: String) = Seq(
      required(f),
      row(f, "allowed", f,
        s"$f IS NOT NULL AND ${present(f)}" +
          s" AND (SELECT count(DISTINCT $f) FROM a) <= 20" +
          s" AND (SELECT count(DISTINCT $f) FROM b) <= 20" +
          // the merged UNION must also stay under the induction cap —
          // merge drops an over-cap union exactly as suggestSchema
          // would on the combined corpus
          s" AND (SELECT count(*) FROM (SELECT $f FROM a WHERE $f IS NOT NULL" +
          s"   UNION SELECT $f FROM b WHERE $f IS NOT NULL)) <= 20" +
          s" AND $f NOT IN (SELECT $f FROM a WHERE $f IS NOT NULL" +
          s" UNION SELECT $f FROM b WHERE $f IS NOT NULL)"),
      row(f, "minlength", f,
        s"$f IS NOT NULL AND ${present(f)} AND length($f) < " +
          s"least((SELECT min(length($f)) FROM a), (SELECT min(length($f)) FROM b))"),
      row(f, "maxlength", f,
        s"$f IS NOT NULL AND ${present(f)} AND length($f) > " +
          s"greatest((SELECT max(length($f)) FROM a), (SELECT max(length($f)) FROM b))"))
    "WITH a AS (SELECT * FROM documents WHERE doc_id % 3 = 0),\n" +
      "b AS (SELECT * FROM documents WHERE doc_id % 3 = 1),\n" +
      "cur AS (SELECT * FROM documents WHERE doc_id % 3 = 2)\n" +
      (numeric("doc_id") ++ numeric("n_chars") ++
        stringy("text") ++ stringy("lang") ++ stringy("source"))
        .mkString("\nUNION ALL\n")
  }

  /** Oracle for `q_schema_diff_documents`: re-derive every aspect of
    * BOTH induced schemas (bounds, length bounds, required flags,
    * allowed sets under the ≤20-cardinality presence guard) from the
    * two slices and emit exactly the rows where they differ, with the
    * engine's change classification (subset ⇒ tightened/loosened,
    * incomparable ⇒ changed) and canonical renderings (integral bounds
    * without `.0`, sets sorted comma-joined).
    */
  private val schemaDiffSql: String = {
    val numFields = Seq("doc_id", "n_chars")
    val strFields = Seq("text", "lang", "source")
    def scal(agg: String, from: String) = s"(SELECT $agg FROM $from)"
    // required/nullable: induced from "slice has zero nulls" per side.
    def reqArms(f: String) = {
      val b = s"(${scal(s"count(*) - count($f)", "documents")} = 0)"
      val a = s"(${scal(s"count(*) - count($f)", "flt")} = 0)"
      Seq(
        s"""SELECT '$f' AS field, 'required' AS aspect,
           | CAST($b AS VARCHAR) AS before, CAST($a AS VARCHAR) AS after,
           | CASE WHEN $a THEN 'tightened' ELSE 'loosened' END AS change
           |WHERE $b <> $a""".stripMargin,
        s"""SELECT '$f', 'nullable', CAST(NOT $b AS VARCHAR),
           | CAST(NOT $a AS VARCHAR),
           | CASE WHEN $a THEN 'tightened' ELSE 'loosened' END
           |WHERE $b <> $a""".stripMargin)
    }
    // numeric min/max: integral rendering (engine fmtNum strips .0).
    def numArm(f: String, aspect: String, fn: String, tightDir: String) = {
      val b = s"CAST(CAST(${scal(s"$fn($f)", "documents")} AS BIGINT) AS VARCHAR)"
      val a = s"CAST(CAST(${scal(s"$fn($f)", "flt")} AS BIGINT) AS VARCHAR)"
      val bd = scal(s"$fn($f)", "documents")
      val ad = scal(s"$fn($f)", "flt")
      s"""SELECT '$f', '$aspect', $b, $a,
         | CASE WHEN $ad $tightDir $bd THEN 'tightened' ELSE 'loosened' END
         |WHERE $bd <> $ad""".stripMargin
    }
    def lenArm(f: String, aspect: String, fn: String, tightDir: String) = {
      val bd = scal(s"$fn(length(CAST($f AS VARCHAR)))", "documents")
      val ad = scal(s"$fn(length(CAST($f AS VARCHAR)))", "flt")
      s"""SELECT '$f', '$aspect', CAST($bd AS VARCHAR), CAST($ad AS VARCHAR),
         | CASE WHEN $ad $tightDir $bd THEN 'tightened' ELSE 'loosened' END
         |WHERE $bd <> $ad""".stripMargin
    }
    // allowed: present iff exact cardinality ≤ 20 and the slice has
    // non-null values; subset direction classifies. Lists live in a
    // per-field CTE (list_has_all rejects scalar-subquery arguments).
    def setsCte(f: String) = {
      def has(from: String) =
        s"(${scal(s"count(DISTINCT $f)", from)} <= 20 AND ${scal(s"count($f)", from)} > 0)"
      def lst(from: String) =
        scal(s"list_sort(list(DISTINCT $f))", s"$from WHERE $f IS NOT NULL")
      s"""sets_$f AS (SELECT ${has("documents")} AS bh, ${has("flt")} AS ah,
         | ${lst("documents")} AS bl, ${lst("flt")} AS al)""".stripMargin
    }
    def allowedArm(f: String) =
      s"""SELECT '$f', 'allowed',
         | CASE WHEN bh THEN array_to_string(bl, ',') END,
         | CASE WHEN ah THEN array_to_string(al, ',') END,
         | CASE WHEN bh AND NOT ah THEN 'loosened'
         |      WHEN ah AND NOT bh THEN 'tightened'
         |      WHEN list_has_all(bl, al) THEN 'tightened'
         |      WHEN list_has_all(al, bl) THEN 'loosened'
         |      ELSE 'changed' END
         |FROM sets_$f
         |WHERE (bh OR ah)
         |  AND (bh <> ah OR coalesce(array_to_string(bl, ','), '') <>
         |                   coalesce(array_to_string(al, ','), ''))""".stripMargin
    val arms =
      numFields.flatMap(f => reqArms(f) ++ Seq(
        numArm(f, "min", "min", ">"), numArm(f, "max", "max", "<"))) ++
      strFields.flatMap(f => reqArms(f) ++ Seq(
        lenArm(f, "minlength", "min", ">"), lenArm(f, "maxlength", "max", "<"),
        allowedArm(f)))
    ("WITH flt AS (SELECT * FROM documents WHERE lang <> 'fr' AND n_chars <= 500),\n" +
      strFields.map(setsCte).mkString(",\n") + "\n") +
      arms.mkString("\nUNION ALL\n")
  }

  private def docViolationCountSql(severities: Set[String]): String = docRuleSql
    .collect { case (_, _, pred, _, sev) if severities(sev) =>
      s"(CASE WHEN $pred THEN 1 ELSE 0 END)"
    }
    .mkString(" + ")

  // ---------------------------------------------------------------------
  // Contract maps.
  // ---------------------------------------------------------------------

  /** Element sub-schema for the array<struct> validation entry
    * (Cerberus `schema`-on-list; reference grounding: element-wise
    * strict schema over Vec<Account>, rust/src/lib.rs:81-83).
    */
  private val accountElemSchema = Schema.of(
    "name" -> FieldSpec(required = true, regex = Some("src[0-9]{1,2}")),
    "n" -> FieldSpec(min = Some(100d), max = Some(500d)))

  /** documents + a derived `accounts: array<struct<name,n>>` column —
    * element 0 from (source, n_chars), element 1 from (lang,
    * n_chars − 200) so every element rule fires on real rows. Mirrored
    * exactly by the `q_validate_elements_documents` oracle.
    */
  private def docsWithAccounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      array(
        struct(col("source").as("name"), col("n_chars").as("n")),
        struct(col("lang").as("name"), (col("n_chars") - lit(200L)).as("n")))
        .as("accounts"))

  /** documents recast for the extended rule vocabulary (round 3):
    * `tags` array (contains), `legacy_src` present only on a doc_id
    * residue class (excludes vs `source`), `attrs` map
    * (keysrules/valuesrules; key null-coalesced — map keys must be
    * non-null), plus raw `source`/`n_chars` for the combinators.
    * Mirrored exactly by the `q_validate_rules_documents` oracle,
    * including Spark's array/map cast-to-string renderings.
    */
  private def docsRules(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      array(col("lang"), col("source")).as("tags"),
      when(pmod(col("doc_id"), lit(7)) === 0, col("source")).as("legacy_src"),
      col("source"),
      col("n_chars"),
      map(coalesce(col("lang"), lit("null")), col("source")).as("attrs"))

  /** Extended-vocabulary schema: contains, excludes, all four
    * combinators, and map keysrules/valuesrules — thresholds chosen so
    * every rule fires on real sf0.01 rows (incl. a warning-channel
    * combinator).
    */
  private val extSchema = Schema.of(
    "tags" -> FieldSpec(contains = Some(Seq("en", "src1"))),
    "legacy_src" -> FieldSpec(excludes = Seq("source")),
    "n_chars" -> FieldSpec(
      // anyof: the low band or the high band (warning channel)
      anyOf = Seq(FieldSpec(max = Some(120d)), FieldSpec(min = Some(480d))),
      // oneof: OVERLAPPING bands — the overlap [300,400] passes both
      oneOf = Seq(
        FieldSpec(min = Some(100d), max = Some(400d)),
        FieldSpec(min = Some(300d), max = Some(500d))),
      ruleSeverity = Map("anyof" -> graft.schema.Severity.Warning)),
    "source" -> FieldSpec(
      allOf = Seq(FieldSpec(regex = Some("src[0-9]+")), FieldSpec(minLength = Some(4))),
      noneOf = Seq(FieldSpec(allowed = Some(Seq("src13"))))),
    "attrs" -> FieldSpec(
      keysRules = Some(FieldSpec(allowed = Some(Seq("de", "en", "es", "fr")))),
      valuesRules = Some(FieldSpec(regex = Some("src[0-9]{1,2}")))))

  /** documents + a deterministically PII-injected text derivative —
    * the synthetic corpus contains no natural PII, so the redaction
    * entry injects one category per doc_id residue class (emails+URLs,
    * IPv4+long ids, or untouched). Mirrored exactly by the
    * `q_redact_documents` oracle.
    */
  private def docsWithPii(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("text_pii",
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
          lit("@example.com or https://site"), col("doc_id").cast("string"),
          lit(".example.org/p?id="), col("doc_id").cast("string")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(col("text"), lit(" host 10.0."),
            pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".25 acct 900000000"), col("doc_id").cast("string")))
        .otherwise(col("text")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_validate_documents" -> ((s, dir) =>
      Validator.violations(docs(s, dir), docSchema, Seq("doc_id"))),
    "q_validate_elements_documents" -> ((s, dir) =>
      // Per-element array<struct> validation: indexed violation paths
      // like accounts[1].name (explode → compiled rules → filter).
      Validator.elementViolations(docsWithAccounts(s, dir),
        accountElemSchema, "accounts", Seq("doc_id"))),
    "q_validate_rules_documents" -> ((s, dir) =>
      // Extended Cerberus vocabulary: contains/excludes/anyof/allof/
      // oneof/noneof/keysrules/valuesrules (round 3).
      Validator.violations(docsRules(s, dir), extSchema, Seq("doc_id"))),
    "q_validate_json_documents" -> ((s, dir) =>
      // Schemas as DATA (round 5): the schema below exists only as a
      // JSON document — parsed by SchemaJson (registry-resolved
      // normalizer, Cerberus array-form dependencies, per-rule
      // severities) and compiled to the same Catalyst rules as the
      // Scala DSL. Reference grounding: the validated domain crosses
      // the data boundary as JSON with parse failure a closed error
      // (accounts_to_json / json_to_accounts, rust/src/lib.rs:73-82).
      Validator.violations(docs(s, dir),
        SchemaJson.fromJson(jsonDocSchema), Seq("doc_id"))),
    "q_schema_check_documents" -> ((s, dir) =>
      // Structural pre-gate (Cerberus allow_unknown analog): the raw
      // documents frame vs a schema that tolerates `text`, declares a
      // nested optional and a required field the table lacks, and does
      // not declare lang/source/n_chars -> unknown.
      Validator.schemaViolations(
        s.read.parquet(s"$dir/documents.parquet"),
        Schema.of(
          "doc_id" -> FieldSpec(required = true),
          "meta.quality" -> FieldSpec(),
          "checksum" -> FieldSpec(required = true)),
        allowUnknown = Set("text"))),
    "q_verdict_documents" -> ((s, dir) =>
      Verdict.compute(docs(s, dir), docSchema, "lang")),
    "q_verdict_rollup_documents" -> ((s, dir) =>
      // Per-lang + grand-total verdicts in ONE pass (ROLLUP).
      Verdict.computeRollup(docs(s, dir), docSchema, "lang")),
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
    "q_quantiles_lineitem" -> ((s, dir) =>
      // Exact interpolating percentile — oracle-parity path (DuckDB
      // quantile_cont is the same type-7 interpolation); the 100 TB
      // path is exact=false (approx_percentile sketch), accuracy pinned
      // vs exact in StatsSpec.
      ColumnStats.quantiles(
          s.read.parquet(s"$dir/lineitem.parquet"),
          "l_quantity", Seq("l_returnflag"),
          qs = Seq(0.25, 0.5, 0.75, 0.95), exact = true)
        .select(col("l_returnflag"), col("q"),
          round(col("value"), 6).as("value"))),
    "q_outliers_lineitem" -> ((s, dir) =>
      // Per-group Tukey-fence outlier summary; exact quartiles for
      // oracle parity, approx sketch as the 100 TB path (StatsSpec).
      ColumnStats.outlierSummary(
          s.read.parquet(s"$dir/lineitem.parquet")
            .select(col("l_returnflag"),
              col("l_extendedprice").cast("double").as("price")),
          "price", Seq("l_returnflag"), k = 1.5, exact = true)
        .select(col("l_returnflag"), col("n_values"), col("n_outliers"),
          round(col("q1"), 6).as("q1"), round(col("q3"), 6).as("q3"),
          round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))),
    "q_unique_lineitem" -> ((s, dir) =>
      Uniqueness.summary(
        s.read.parquet(s"$dir/lineitem.parquet"),
        Seq("l_orderkey", "l_linenumber"))),
    "q_dups_events" -> ((s, dir) =>
      Uniqueness.duplicates(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("user_id", "event_type"))),
    "q_salted_counts_lineitem" -> ((s, dir) =>
      // Two-phase salted aggregation (skew path) — must equal a plain
      // groupBy exactly; the oracle IS the plain groupBy.
      Uniqueness.groupCountsSalted(
        s.read.parquet(s"$dir/lineitem.parquet"), "l_suppkey", nSalts = 32)),
    "q_lenhist_documents" -> ((s, dir) =>
      ColumnStats.lengthHistogram(docs(s, dir), "text", Seq("lang"), binWidth = 50)),
    "q_ri_orders_customer" -> ((s, dir) =>
      RefIntegrity.summary(
        s.read.parquet(s"$dir/orders.parquet"),
        s.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"))),
    "q_ri_bloom_orders_customer" -> ((s, dir) => {
      // Bloom-accelerated exact RI: probe-miss rows are orphans with
      // zero shuffle; only probe-hit rows reach the anti-join. Must be
      // row-identical to the plain-join summary — the oracle is the
      // same NOT EXISTS count.
      val dim = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("o_custkey"))
      val bloom = RefIntegrity.buildKeyBloom(
        dim, Seq("o_custkey"), expectedItems = 200000L, fpp = 0.01)
      RefIntegrity.summaryWithBloom(
        s.read.parquet(s"$dir/orders.parquet"), dim, Seq("o_custkey"), bloom)
    }),
    "q_drift_documents" -> ((s, dir) =>
      Drift.againstGlobal(docs(s, dir), "n_chars", Seq("lang"),
        nBins = 20, lo = 0d, hi = 600d)),
    "q_asof_events" -> ((s, dir) => {
      // Point-in-time join: each click sees the user's most recent
      // purchase value at-or-before its timestamp (never the future).
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
        .where(col("ts").isNotNull)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("purchase_value"))
      graft.temporal.Temporal.asofJoin(clicks, purchases,
        Seq("user_id"), "ts", "ts", Seq("purchase_value"))
    }),
    "q_sessions_events" -> ((s, dir) => {
      // Gap-based sessionization (1 h inactivity gap) + per-session
      // rollup — the unit a session-level pipeline samples/dedups on.
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
        .where(col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"))
      graft.temporal.Temporal.sessionSummary(ev, "user_id", "ts",
        gapSeconds = 3600L, tieBreak = Seq("event_id"))
    }),
    "q_drift_categorical_documents" -> ((s, dir) => {
      // Categorical drift (PSI + total variation) of the source
      // distribution per lang, between even- and odd-id halves.
      val d = docs(s, dir)
      Drift.categoricalCompare(
        d.where(pmod(col("doc_id"), lit(2)) === 0),
        d.where(pmod(col("doc_id"), lit(2)) === 1),
        "source", Seq("lang"))
    }),
    "q_drift_events" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      Drift.compare(
        ev.where(pmod(col("event_id"), lit(2)) === 0),
        ev.where(pmod(col("event_id"), lit(2)) === 1),
        "value", Seq("event_type"), nBins = 25, lo = 0d, hi = 500d)
    }),
    "q_drift_auto_events" -> ((s, dir) => {
      // AUTO-binned drift: edges derived from the BASELINE's quantiles
      // (equal-mass bins — no caller lo/hi guesses); exact percentile
      // here so the oracle recomputes identical edges via quantile_cont
      // (the 100 TB path is exact=false, the approx_percentile sketch).
      val ev = s.read.parquet(s"$dir/events.parquet")
      Drift.compareAuto(
        ev.where(pmod(col("event_id"), lit(2)) === 0),
        ev.where(pmod(col("event_id"), lit(2)) === 1),
        "value", Seq("event_type"), nBins = 4, exact = true)
    }),

    // --- training-data pipeline: text analysis -------------------------
    "q_tokens_documents" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens_ws"),
        TextAnalysis.tokenCountBpe(col("text")).cast("long").as("n_tokens_bpe"))),
    "q_langid_documents" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir), "text")
        .select(col("doc_id"), col("s_en").cast("long"), col("s_de").cast("long"),
          col("s_es").cast("long"), col("s_fr").cast("long"), col("lang_pred"))),
    "q_quality_documents" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(docs(s, dir), "text")
        .select(col("doc_id"), col("n_chars_txt").cast("long"),
          col("n_tokens").cast("long"),
          round(col("alpha_ratio"), 6).as("alpha_ratio"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("stop_ratio"), 6).as("stop_ratio"),
          round(col("quality"), 6).as("quality"))),
    "q_fingerprint_documents" -> ((s, dir) =>
      TextAnalysis.fingerprint(docs(s, dir), "text")
        .select(col("doc_id"), col("content_sha"), col("fp64"))),
    "q_repetition_documents" -> ((s, dir) =>
      // Gopher-style repetition/boilerplate features — per-doc mode via
      // a zero-shuffle sorted-array run-length scan (aggregate HOF).
      TextAnalysis.repetitionFeatures(docs(s, dir), "text")
        .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
          round(col("dup_word_frac"), 6).as("dup_word_frac"),
          round(col("top_word_frac"), 6).as("top_word_frac"),
          round(col("top_bigram_frac"), 6).as("top_bigram_frac"),
          round(col("symbol_ratio"), 6).as("symbol_ratio"))),
    "q_redact_documents" -> ((s, dir) =>
      // PII scrubbing over a deterministically PII-injected derivative
      // of the text column (the base corpus is synthetic and clean, so
      // the injection makes every category fire; the oracle injects the
      // identical strings and replays the same ordered regex passes).
      TextAnalysis.redactPii(docsWithPii(s, dir), "text_pii")
        .select(col("doc_id"), col("n_url"), col("n_email"), col("n_ipv4"),
          col("n_id_digits"), col("text_redacted"))),
    "q_toptokens_documents" -> ((s, dir) =>
      // Exact corpus-wide heavy hitters (vocabulary head): shuffle
      // bounded by vocab size, top-k via TakeOrderedAndProject.
      TextAnalysis.topTokens(docs(s, dir), "text", k = 20)),

    "q_pipeline_documents" -> ((s, dir) =>
      // End-to-end corpus curation funnel (validate → dedup → quality →
      // sample → pack) — per-stage counts, fully replayed by the oracle.
      graft.pipeline.CorpusPipeline.metrics(docs(s, dir),
        graft.pipeline.CorpusPipeline.Config(
          schema = docSchema,
          qualityMin = 0.5,
          sampleRates = Map("en" -> 0.5)))),
    "q_pack_documents" -> ((s, dir) =>
      // Sequence packing: bucket-local first-fit-by-start packs with a
      // 2000-char budget; audit view (docs + fill per pack). The bucket
      // count is DERIVED from the input size (ceil(rows/100) here —
      // bounded per-bucket sorts at any scale); the oracle recomputes
      // the identical derivation from the same table.
      graft.pack.Packing.packSummaryAuto(docs(s, dir), "doc_id", "n_chars",
        budget = 2000L, targetRowsPerBucket = 100L)),
    "q_sample_documents" -> ((s, dir) =>
      // Deterministic stratified downsampling (rebalance languages):
      // keep/drop is a pure function of (doc_id, seed) → identical
      // rows at any parallelism, rerun, or engine (md5-bucket based —
      // the oracle recomputes it exactly in DuckDB).
      graft.sample.Sampling.stratified(docs(s, dir), "doc_id", "lang",
          rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 1.0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))),
    "q_sample_joined_documents" -> ((s, dir) =>
      // The SAME rates forced through stratified()'s broadcast-join
      // compilation (whenChainMaxStrata = 0) — the high-cardinality
      // path whose plan is O(1) in |rates| — against the identical
      // DuckDB oracle as q_sample: both compilations must select the
      // same rows.
      graft.sample.Sampling.stratified(docs(s, dir), "doc_id", "lang",
          rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 1.0,
          seed = 42L, whenChainMaxStrata = 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"))),

    "q_reservoir_documents" -> ((s, dir) =>
      // Fixed-size per-group sample (per-domain cap): exactly
      // min(7, |lang|) docs per language, selection a pure function of
      // (doc_id, lang, seed) — the oracle replays it row-for-row.
      graft.sample.Sampling.reservoirPerGroup(docs(s, dir), "doc_id", "lang", k = 7)
        .select(col("lang"), col("doc_id"))),

    "q_profile_documents" -> ((s, dir) =>
      // Schema inference step 1: one-pass per-field corpus profile
      // (null rate, cardinality, numeric parse rate, value/length
      // bounds) — the stats rule induction derives the strictest
      // consistent schema from. exact=true for oracle parity; the
      // 100 TB default is the HLL sketch (no Expand).
      graft.schema.Induction.profile(docs(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"), exact = true)),

    "q_expectations_documents" -> ((s, dir) =>
      // Table-level expectation suite (dbt-test / Great-Expectations
      // layer): aggregate invariants per lang slice, ALL evaluated in
      // one grouped aggregation; verdict rows are data (E4). The
      // bounds are chosen so both pass and fail rows occur.
      graft.verdict.Expectations.evaluate(docs(s, dir), Seq(
        graft.verdict.Expectations.Expect("row_count", lo = 50),
        graft.verdict.Expectations.Expect("null_frac", "text", hi = 0.1),
        graft.verdict.Expectations.Expect("distinct", "source", lo = 10, hi = 30),
        graft.verdict.Expectations.Expect("mean", "n_chars", lo = 100, hi = 1000),
        graft.verdict.Expectations.Expect("max", "n_chars", hi = 550),
        // key uniqueness as ONE declared check (doc_id passes at 1.0;
        // source is many-rows-per-value, so its row fails — both
        // outcomes exercised)
        graft.verdict.Expectations.Expect("unique_frac", "doc_id", lo = 1.0),
        graft.verdict.Expectations.Expect("unique_frac", "source", lo = 0.9),
        // exact interpolated median (GE-style quantile bound) — DuckDB
        // quantile_cont replays Spark's percentile exactly
        graft.verdict.Expectations.Expect("quantile", "n_chars",
          lo = 100, hi = 400, q = 0.5)),
        groupCols = Seq("lang"))),

    "q_suggested_expectations_documents" -> ((s, dir) => {
      // Expectation INDUCTION (round 5, the table-level mirror of V19):
      // suggest() profiles the even-doc_id half into a suite —
      // row_count band, per-column null_frac ceilings, induced
      // uniqueness (doc_id only), distinct caps (low-cardinality lang/
      // source only), spread-scaled numeric bands — then evaluate()
      // gates the odd half with it. The oracle re-derives every bound
      // from the base slice and every observation from the current one.
      // tolerance 0.25 is exactly representable in binary — bound
      // arithmetic is bit-identical in Spark and DuckDB doubles. The
      // current slice carries an injected +200 n_chars shift (the two
      // parity halves are statistically identical, so without it every
      // gate passes vacuously): the shift breaks the induced mean and
      // max bands while row_count / null_frac / uniqueness / distinct
      // caps keep passing — both verdict outcomes exercised.
      val all = s.read.parquet(s"$dir/documents.parquet")
      val base = all.where(col("doc_id") % 2 === 0)
      val cur = all.where(col("doc_id") % 2 =!= 0)
        .withColumn("n_chars", col("n_chars") + 200)
      graft.verdict.Expectations.evaluate(cur,
        graft.verdict.Expectations.suggest(base,
          Seq("doc_id", "lang", "source", "n_chars"), tolerance = 0.25))
    }),

    "q_expectations_rel_documents" -> ((s, dir) => {
      // Baseline-RELATIVE expectation gates (round 5): each *_rel check
      // gates current/previous of its base metric, previous = a stored
      // evaluate() snapshot. Baseline = even-doc_id half WITHOUT fr,
      // current = odd half WITHOUT de — so fr rows exercise the
      // no-baseline-must-FAIL rule, de rows the vanished-group rule,
      // and the remaining langs ratio ≈ 1 inside their declared bands.
      // (The persisted-store path over the same engine is pinned in
      // ExpectationsSpec — the contract entry stays filesystem-free.)
      import graft.verdict.Expectations.{Expect, evaluate, evaluateRelative}
      val d = docs(s, dir)
        .withColumn("grp", coalesce(col("lang"), lit("__null__")))
        .withColumn("region_hint", when(col("n_chars") <= 500, col("lang")))
      val baseChecks = Seq(Expect("row_count"),
        Expect("null_frac", "region_hint"),
        Expect("distinct", "source"), Expect("mean", "n_chars"))
      val baseline = evaluate(
        d.where(col("doc_id") % 2 === 0 && col("grp") =!= "fr"),
        baseChecks, Seq("grp"))
      evaluateRelative(
        d.where(col("doc_id") % 2 === 1 && col("grp") =!= "de"),
        Seq(Expect("row_count_rel", lo = 0.5, hi = 2.0),
          Expect("null_frac_rel", "region_hint", lo = 0.25, hi = 4.0),
          Expect("distinct_rel", "source", lo = 0.5, hi = 2.0),
          Expect("mean_rel", "n_chars", lo = 0.9, hi = 1.1)),
        baseline, Seq("grp"))
    }),

    "q_rule_breakdown_documents" -> ((s, dir) =>
      // Per-(field, rule, severity) triage rollup: which rules fired,
      // how often, over how many distinct values, with the value range
      // as examples — O(rules) output rows at any corpus size.
      graft.verdict.Verdict.ruleBreakdown(docs(s, dir), docSchema)),

    "q_induced_validate_documents" -> ((s, dir) => {
      // Schema inference end-to-end: induce the strictest schema from
      // the doc_id-multiple-of-3 slice (the "known-good baseline" snapshot) and
      // validate the remaining two thirds against it — the violations ARE the
      // distribution delta between the halves. The oracle re-derives
      // every induced bound (required guards, numeric min/max, allowed
      // sets under the cardinality cap, length bounds) as scalar
      // subqueries over the same base half and replays every rule.
      val d = docs(s, dir)
      val schema = graft.schema.Induction.suggestSchema(
        d.where(col("doc_id") % 3 === 0),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      Validator.violations(d.where(col("doc_id") % 3 =!= 0), schema, Seq("doc_id"))
    }),

    "q_repairs_documents" -> ((s, dir) => {
      // REPAIR induction (round 5): a shape-noisy column (uppercased /
      // space-prefixed variants injected by doc_id residue) against a
      // lowercase regex + allowed-list; every (rule × builtin
      // normalizer) cell measures repaired AND broken counts in one
      // aggregation — trim_lower repairs every violation with zero
      // breakage, upper repairs nothing and breaks every passing row.
      // The oracle replays each cell's before/after predicates.
      val noisy = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("lang2",
          when(col("doc_id") % 3 === 0, upper(col("lang")))
            .when(col("doc_id") % 3 === 1, concat(lit(" "), col("lang")))
            .otherwise(col("lang")))
      graft.repair.Repair.suggestRepairs(noisy, Schema.of(
        "lang2" -> FieldSpec(
          regex = Some("[a-z]{2}"),
          allowed = Some(Seq("de", "en", "es", "fr")))))
    }),

    "q_repairs_grouped_documents" -> ((s, dir) => {
      // Per-group repair induction: the same cells keyed by the
      // ORIGINAL lang — which normalizer fixes which slice (the noise
      // is doc_id-residue-injected, so every lang group carries all
      // three shape classes). Same single aggregation, grouped.
      val noisy = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("lang2",
          when(col("doc_id") % 3 === 0, upper(col("lang")))
            .when(col("doc_id") % 3 === 1, concat(lit(" "), col("lang")))
            .otherwise(col("lang")))
      graft.repair.Repair.suggestRepairs(noisy, Schema.of(
        "lang2" -> FieldSpec(
          regex = Some("[a-z]{2}"),
          allowed = Some(Seq("de", "en", "es", "fr")))),
        groupCols = Seq("lang"))
    }),

    "q_schema_merge_documents" -> ((s, dir) => {
      // INCREMENTAL induction (round 5): induce per slice, widen with
      // Induction.merge (required = both, bounds = envelope, allowed =
      // union under both caps), validate a third slice against the
      // merged schema — violations fire only OUTSIDE the widened
      // two-slice distribution. The oracle re-derives every merged
      // bound as least/greatest of the two slices' scalar subqueries
      // and the allowed union as a UNION subquery.
      val d = s.read.parquet(s"$dir/documents.parquet")
      val flds = Seq("doc_id", "text", "lang", "source", "n_chars")
      val merged = graft.schema.Induction.merge(
        graft.schema.Induction.suggestSchema(
          d.where(col("doc_id") % 3 === 0), flds),
        graft.schema.Induction.suggestSchema(
          d.where(col("doc_id") % 3 === 1), flds))
      Validator.violations(d.where(col("doc_id") % 3 === 2), merged,
        Seq("doc_id"))
    }),

    "q_schema_diff_documents" -> ((s, dir) => {
      // Rule-level schema drift (round 5): induce the strictest schema
      // from the full table and from a filtered "cleaned" snapshot
      // (no fr, no oversized docs), then diff — the tightened rows
      // forecast which violations the new snapshot's rules would raise
      // on the old corpus. The oracle re-derives every aspect of both
      // induced schemas from the two slices and replays the diff.
      val d = s.read.parquet(s"$dir/documents.parquet")
      val flds = Seq("doc_id", "text", "lang", "source", "n_chars")
      val before = graft.schema.Induction.suggestSchema(d, flds)
      val after = graft.schema.Induction.suggestSchema(
        d.where(col("lang") =!= "fr" && col("n_chars") <= 500), flds)
      graft.schema.Induction.diff(s, before, after)
    }),

    "q_temperature_documents" -> ((s, dir) =>
      // UniMax-style mixture rebalancing: per-lang keep rates
      // r_g = (n_min/n_g)^(1-alpha) derived from the group counts, then
      // the same pure (key, seed) filter as q_sample — the oracle
      // re-derives the rates, thresholds, and exact row set.
      graft.sample.Sampling.temperatureSample(
          docs(s, dir), "doc_id", "lang", alpha = 0.5)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))),
    "q_temperature_joined_documents" -> ((s, dir) =>
      // The DISTRIBUTED temperature path (rates derived and broadcast-
      // joined fully in-plan, zero driver collect — the 10⁵⁺-strata
      // variant) against the identical oracle: both derivations must
      // select the same rows.
      graft.sample.Sampling.temperatureSampleDistributed(
          docs(s, dir), "doc_id", "lang", alpha = 0.5)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))),

    "q_normalize_documents" -> ((s, dir) =>
      // Cerberus's NORMALIZATION half end-to-end: rename (source →
      // origin), purge_unknown (drops the derived size_tag column),
      // default (null region_hint → 'unknown'), default_setter (absent
      // quality_bucket column computed from n_chars), declared
      // normalize coercion (trim text) — the oracle replays the whole
      // document transform per row.
      Validator.normalizeDocument(docsForNormalize(s, dir), normSchema,
        purgeUnknown = true)),
    "q_normalize_actions_documents" -> ((s, dir) =>
      // Applied normalization actions as data (E4): one row per
      // injected default — null-region_hint rows get the literal
      // default, EVERY row gets the computed quality_bucket (the
      // column is absent from the frame).
      Validator.normalizationActions(docsForNormalize(s, dir), normSchema,
        Seq("doc_id"))),

    "q_normalize_nested_documents" -> ((s, dir) =>
      // Struct-path normalization (round 5): defaults + coercions on
      // dotted paths — meta.region defaulted then uppercased,
      // meta.origin_tag CREATED inside the struct; rows whose meta
      // struct is null stay null (no injection through a null parent).
      // Output flattened to scalars for the driver harness.
      Validator.normalizeDocument(docsNested(s, dir), nestedNormSchema)
        .select(col("doc_id"), col("meta.region").as("region"),
          col("meta.size").as("size"),
          col("meta.origin_tag").as("origin_tag"))),
    "q_normalize_elements_documents" -> ((s, dir) =>
      // Per-element normalization (round 5): upper-coercion on every
      // element name + literal default for null element n, applied
      // inside ONE transform projection; exploded to scalar rows.
      Validator.normalizeElements(
          docsAccountsNullable(s, dir), elemNormSchema, "accounts")
        .select(col("doc_id"), posexplode(col("accounts")))
        .select(col("doc_id"), col("pos").as("idx"),
          col("col.name").as("name"), col("col.n").as("n"))),

    "q_validate_items_documents" -> ((s, dir) => {
      // Positional `items` rules (tuple-shaped lists): a 3-slot attrs
      // tuple [source, lang, size_tag] — docs on the doc_id%29 slice
      // get a truncated 2-slot tuple (length violation on the parent,
      // value = actual size); full tuples check slot 0 against the
      // source regex, slot 1 against the lang allow-list, slot 2
      // against integer-parseability.
      val d = docs(s, dir).withColumn("attrs",
        when(col("doc_id") % 29 === 0, array(col("source"), col("lang")))
          .otherwise(array(col("source"), col("lang"), col("size_tag"))))
      Validator.violations(d, itemsSchema, Seq("doc_id"))
    }),

    "q_budget_documents" -> ((s, dir) => {
      // Quality-ranked trim to a global token budget: keep the maximal
      // quality-descending prefix whose token sum fits. Computed via
      // the binned-cutoff plan (no global sort — only the boundary
      // score bin pays an ordered scan); the oracle replays the
      // global-prefix SEMANTICS directly with a window cumsum.
      val scored = TextAnalysis.qualityFeatures(docs(s, dir), "text")
        .withColumn("quality_r", round(col("quality"), 6))
      graft.sample.Sampling.selectByTokenBudget(
          scored, "doc_id", "n_tokens", "quality_r", budget = 20000L)
        .select(col("doc_id"), col("lang"))
    }),

    // --- training-data pipeline: deduplication -------------------------
    "q_dedup_exact_documents" -> ((s, dir) =>
      Dedup.exactSummary(docs(s, dir), "text")),
    "q_jaccard_pairs_documents" -> ((s, dir) =>
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text",
          n = 3, maxDf = 50, minJaccard = 0.5)
        .select(col("id_a"), col("id_b"), col("n_common"),
          col("size_a"), col("size_b"), round(col("jaccard"), 6).as("jaccard"))),
    "q_contamination_documents" -> ((s, dir) => {
      // Train/test leakage check: the "eval set" is a deterministic
      // slice of documents reduced to a 120-char prefix (an eval item
      // extracted from a training doc) — every probe must surface its
      // source doc with high containment.
      val corpus = docs(s, dir)
      val probe = corpus
        .where(col("doc_id") % 23 === 0)
        .select(col("doc_id").as("probe_id"),
          substring(col("text"), 1, 120).as("text"))
      Dedup.contaminationPairs(corpus, "doc_id", probe, "probe_id", "text",
          n = 3, maxDf = 50, minContainment = 0.4, broadcastProbe = true)
        .select(col("probe_id"), col("corpus_id"), col("n_common"),
          col("probe_size"), round(col("containment"), 6).as("containment"))
    }),
    "q_contaminated_probes_documents" -> ((s, dir) => {
      val corpus = docs(s, dir)
      val probe = corpus
        .where(col("doc_id") % 23 === 0)
        .select(col("doc_id").as("probe_id"),
          substring(col("text"), 1, 120).as("text"))
      Dedup.contaminatedProbes(
          Dedup.contaminationPairs(corpus, "doc_id", probe, "probe_id", "text",
            n = 3, maxDf = 50, minContainment = 0.4, broadcastProbe = true))
        .select(col("probe_id"), col("n_matches"),
          round(col("max_containment"), 6).as("max_containment"),
          col("best_corpus_id"))
    }),
    "q_cluster_documents" -> ((s, dir) =>
      // Near-dup CLUSTERS from pairs: connected components (iterative
      // min-label propagation) over the exact Jaccard pair graph —
      // (doc_id, component = min reachable id, n_members). The oracle
      // replays the transitive closure with a recursive CTE.
      Dedup.clusterAssignments(
          Dedup.jaccardPairs(docs(s, dir), "doc_id", "text",
            n = 3, maxDf = 50, minJaccard = 0.5))
        .select(col("id").as("doc_id"), col("component"), col("n_members"))),
    "q_minhash_documents" -> ((s, dir) =>
      // MinHash signatures, exploded to one (doc_id, pos, minhash) row
      // per signature coordinate — scalar columns so the driver's
      // rows-only harness can sort/hash them (an array<bigint> column
      // crashes pandas). xxhash64 isn't DuckDB-expressible → rows-only;
      // bit-level semantics pinned in DedupSpec/HashExprsSpec.
      Dedup.minHashSignatures(docs(s, dir), "doc_id", "text", k = 64, shingleN = 8)
        .select(col("id").as("doc_id"), posexplode(col("sig")))
        .select(col("doc_id"), col("pos"), col("col").as("minhash"))),
    "q_neardup_minhash_documents" -> ((s, dir) =>
      Dedup.minHashNearDuplicates(docs(s, dir), "doc_id", "text",
        k = 64, bands = 16, shingleN = 8, minEstJaccard = 0.5)),
    "q_simhash_documents" -> ((s, dir) =>
      Dedup.simHash(docs(s, dir), "doc_id", "text")),

    // --- training-data pipeline: embedding similarity ------------------
    "q_ann_topk_embeddings" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos_sim"),
          col("rank").cast("long").as("rank"))
    }),
    "q_ann_lsh_embeddings" -> ((s, dir) => {
      // LSH-bucketed ANN (deterministic hyperplanes; rows-only check;
      // recall vs brute force pinned in SimilaritySpec).
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.annTopK(emb, emb.where(col("vec_id") < 10), "vec_id",
        "embedding", dim = 64, k = 5, nPlanes = 4, nTables = 16)
    }),
    "q_ann_ivf_embeddings" -> ((s, dir) => {
      // IVF (centroid-partitioned) ANN — rows-only check (iterated
      // centroids are FP-order dependent); exact brute-force equality
      // at nProbe = nLists and recall floors pinned in IvfSpec.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      graft.sim.Ivf.ivfTopK(emb, emb.where(col("vec_id") < 10), "vec_id",
        "embedding", dim = 64, k = 5, nLists = 16, nProbe = 6, iters = 3)
    }),
    "q_neardup_embeddings" -> ((s, dir) => {
      // Exact O(n²) variant — oracle companion ONLY (DuckDB-checkable at
      // sf0.01); the scale path is q_neardup_lsh_embeddings below.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.nearDupPairsExact(emb, "vec_id", "embedding", minCosine = 0.35)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_sim"))
    }),
    "q_neardup_lsh_embeddings" -> ((s, dir) => {
      // LSH-bucketed near-dup pairs — the 100 TB path (bucket-bounded
      // candidate joins, no cartesian). Rows-only check (probabilistic
      // recall); pairs ⊆ exact + recall floor pinned in SimilaritySpec.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.nearDupPairsLsh(emb, "vec_id", "embedding",
          dim = 64, minCosine = 0.35, nPlanes = 6, nTables = 12)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_sim"))
    }),

    // --- training-data pipeline: multimodal plumbing (stub decode) -----
    "q_multimodal_meta" -> ((s, _) =>
      Multimodal.metaSummary(mediaTable(s))),
    "q_multimodal_decode" -> ((s, _) =>
      // Exercises the mapPartitions decode path itself: the stub header
      // math is deterministic and replayed byte-for-byte by the oracle
      // over the same materialized parquet (sha256 column excluded —
      // DuckDB 1.0 has no BLOB sha; content identity is covered by
      // q_multimodal_meta's distinct-blob count).
      Multimodal.decodeImageMeta(mediaTable(s))
        .select(col("media_id"), col("width"), col("height"),
          col("channels"), col("size_bytes"))),
    "q_multimodal_frames" -> ((s, _) =>
      // Frame-sampling generator (the second media kind's decode
      // path): video rows explode into (frame_idx, frame_ts_ms) rows;
      // the stub frame count is plain modular arithmetic so the oracle
      // replays the WHOLE generator, not just the timestamp math.
      Multimodal.sampleFrames(mediaTable(s), everyMs = 40))
  )

  /** Deterministic synthetic media table, materialized ONCE to a fixed
    * parquet path so the DuckDB oracle can read the identical bytes
    * (the generator is pure expressions — content is identical across
    * runs, so the write is idempotent). Anchored to the working
    * directory, not a hardcoded checkout location — the oracle SQL
    * embeds whatever absolute path THIS run resolved.
    */
  private val mediaPath =
    new java.io.File("target/graft_media_1000").getAbsolutePath

  private def mediaTable(s: SparkSession): DataFrame = {
    if (!new java.io.File(s"$mediaPath/_SUCCESS").exists())
      Multimodal.synthMedia(s, 1000L).write.mode("overwrite").parquet(mediaPath)
    s.read.parquet(mediaPath)
  }

  /** Element-rule replay for the accounts array: element 0 = (source,
    * n_chars), element 1 = (lang, n_chars − 200); same rule predicates
    * as RuleCompiler emits, with indexed field paths.
    */
  private val elemViolationsSql: String = {
    // (elemIdx, nameExpr, nExpr)
    val elems = Seq((0, "source", "n_chars"), (1, "lang", "n_chars - 200"))
    elems.flatMap { case (i, nm, nv) => Seq(
      s"SELECT doc_id, 'accounts[$i].name' AS field, 'required' AS rule, CAST(NULL AS VARCHAR) AS value, 'error' AS severity FROM documents WHERE $nm IS NULL",
      s"SELECT doc_id, 'accounts[$i].name' AS field, 'regex' AS rule, $nm AS value, 'error' AS severity FROM documents WHERE $nm IS NOT NULL AND NOT regexp_full_match($nm, 'src[0-9]{1,2}')",
      s"SELECT doc_id, 'accounts[$i].n' AS field, 'min' AS rule, CAST($nv AS VARCHAR) AS value, 'error' AS severity FROM documents WHERE ($nv) IS NOT NULL AND ($nv) < 100",
      s"SELECT doc_id, 'accounts[$i].n' AS field, 'max' AS rule, CAST($nv AS VARCHAR) AS value, 'error' AS severity FROM documents WHERE ($nv) IS NOT NULL AND ($nv) > 500"
    )}.mkString(" UNION ALL ")
  }

  /** Shared CTE chain recomputing [[Dedup.jaccardPairs]] (n=3,
    * maxDf=50) in DuckDB — `jp` = all candidate pairs with exact
    * jaccard; consumed by the pair oracle (threshold filter) and the
    * clustering oracle (recursive closure).
    */
  private val jaccardCtes: String =
    """d AS (
      | SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      | FROM documents WHERE text IS NOT NULL),
      |w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM d),
      |g AS (SELECT doc_id,
      |  list_distinct(list_transform(range(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gs
      | FROM w WHERE len(ws) >= 3),
      |s0 AS (SELECT doc_id, unnest(gs) AS sh FROM g),
      |s AS (SELECT doc_id, sh FROM (
      |  SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS dfc FROM s0)
      | WHERE dfc <= 50),
      |sz AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      |      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |jp AS (SELECT id_a, id_b, n_common, sa.sz AS size_a, sb.sz AS size_b,
      |        n_common / CAST(sa.sz + sb.sz - n_common AS DOUBLE) AS jaccard
      |       FROM p JOIN sz sa ON sa.doc_id = p.id_a
      |              JOIN sz sb ON sb.doc_id = p.id_b)""".stripMargin

  /** Cross-corpus contamination CTEs: corpus trigram index with the
    * corpus hot-shingle (df > 50) filter, probe = 120-char prefixes of
    * every 23rd doc, containment = |probe ∩ corpus| / |probe| — the
    * exact replay of `Dedup.contaminationPairs` for the oracle.
    */
  private val contaminationCtes: String =
    """cd AS (
      | SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      | FROM documents WHERE text IS NOT NULL),
      |cw AS (SELECT doc_id, string_split(t, ' ') AS ws FROM cd),
      |cg AS (SELECT doc_id,
      |  list_distinct(list_transform(range(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gs
      | FROM cw WHERE len(ws) >= 3),
      |cs0 AS (SELECT doc_id, unnest(gs) AS sh FROM cg),
      |hot AS (SELECT sh FROM cs0 GROUP BY sh HAVING count(*) > 50),
      |cs AS (SELECT doc_id AS corpus_id, sh FROM cs0
      |       WHERE sh NOT IN (SELECT sh FROM hot)),
      |pd AS (
      | SELECT doc_id AS probe_id,
      |  trim(regexp_replace(lower(substr(text, 1, 120)), '\s+', ' ', 'g')) AS t
      | FROM documents WHERE text IS NOT NULL AND doc_id % 23 = 0),
      |pw AS (SELECT probe_id, string_split(t, ' ') AS ws FROM pd),
      |pg AS (SELECT probe_id,
      |  list_distinct(list_transform(range(1, len(ws) - 1),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gs
      | FROM pw WHERE len(ws) >= 3),
      |ps0 AS (SELECT probe_id, unnest(gs) AS sh FROM pg),
      |ps AS (SELECT probe_id, sh FROM ps0
      |       WHERE sh NOT IN (SELECT sh FROM hot)),
      |psz AS (SELECT probe_id, count(*) AS probe_size FROM ps GROUP BY 1),
      |cp AS (
      | SELECT probe_id, corpus_id, count(*) AS n_common
      | FROM cs JOIN ps USING (sh) GROUP BY 1, 2),
      |cpj AS (
      | SELECT probe_id, corpus_id, n_common, psz.probe_size,
      |  n_common / CAST(psz.probe_size AS DOUBLE) AS containment
      | FROM cp JOIN psz USING (probe_id))""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_validate_documents" -> docViolationsSql,
    "q_validate_json_documents" -> jsonValidateSql,
    // Extended vocabulary: each rule's predicate + Spark's exact
    // container cast-to-string rendering, replayed literally.
    "q_validate_rules_documents" ->
      """SELECT doc_id, 'tags' AS field, 'contains' AS rule,
        | '[' || coalesce(lang, 'null') || ', ' || coalesce(source, 'null') || ']' AS value,
        | 'error' AS severity
        |FROM documents
        |WHERE NOT (coalesce(lang = 'en', FALSE) OR coalesce(source = 'en', FALSE))
        |   OR NOT (coalesce(lang = 'src1', FALSE) OR coalesce(source = 'src1', FALSE))
        |UNION ALL
        |SELECT doc_id, 'legacy_src', 'excludes', source, 'error'
        |FROM documents WHERE doc_id % 7 = 0 AND source IS NOT NULL
        |UNION ALL
        |SELECT doc_id, 'n_chars', 'anyof', CAST(n_chars AS VARCHAR), 'warning'
        |FROM documents
        |WHERE n_chars IS NOT NULL AND NOT (n_chars <= 120 OR n_chars >= 480)
        |UNION ALL
        |SELECT doc_id, 'n_chars', 'oneof', CAST(n_chars AS VARCHAR), 'error'
        |FROM documents
        |WHERE n_chars IS NOT NULL AND
        | (CASE WHEN n_chars >= 100 AND n_chars <= 400 THEN 1 ELSE 0 END +
        |  CASE WHEN n_chars >= 300 AND n_chars <= 500 THEN 1 ELSE 0 END) <> 1
        |UNION ALL
        |SELECT doc_id, 'source', 'allof', source, 'error'
        |FROM documents
        |WHERE source IS NOT NULL AND
        | NOT (regexp_full_match(source, 'src[0-9]+') AND length(source) >= 4)
        |UNION ALL
        |SELECT doc_id, 'source', 'noneof', source, 'error'
        |FROM documents WHERE source IS NOT NULL AND source = 'src13'
        |UNION ALL
        |SELECT doc_id, 'attrs', 'keysrules',
        | '{' || coalesce(lang, 'null') || ' -> ' || coalesce(source, 'null') || '}',
        | 'error'
        |FROM documents
        |WHERE coalesce(lang, 'null') NOT IN ('de', 'en', 'es', 'fr')
        |UNION ALL
        |SELECT doc_id, 'attrs', 'valuesrules',
        | '{' || coalesce(lang, 'null') || ' -> ' || coalesce(source, 'null') || '}',
        | 'error'
        |FROM documents
        |WHERE source IS NOT NULL AND NOT regexp_full_match(source, 'src[0-9]{1,2}')""".stripMargin,
    // Structural pre-gate: the oracle states the expected structural
    // truth as constants (the engine derives it from runtime metadata).
    "q_schema_check_documents" ->
      """SELECT 'lang' AS field, 'unknown' AS rule, 'string' AS value, 'error' AS severity
        |UNION ALL SELECT 'source', 'unknown', 'string', 'error'
        |UNION ALL SELECT 'n_chars', 'unknown', 'bigint', 'error'
        |UNION ALL SELECT 'meta.quality', 'missing', CAST(NULL AS VARCHAR), 'warning'
        |UNION ALL SELECT 'checksum', 'missing', CAST(NULL AS VARCHAR), 'error'""".stripMargin,
    "q_validate_elements_documents" -> elemViolationsSql,
    "q_verdict_documents" ->
      s"""SELECT lang, count(*) AS n_rows,
         | CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_rows,
         | CAST(SUM(v) AS BIGINT) AS n_violations,
         | CAST(SUM(w) AS BIGINT) AS n_warnings,
         | CAST(SUM(e) AS BIGINT) AS n_errors,
         | CASE WHEN SUM(e) > 0 THEN 'error'
         |      WHEN SUM(w) > 0 THEN 'warning'
         |      ELSE NULL END AS worst_severity,
         | SUM(e) = 0 AS pass
         |FROM (SELECT lang,
         |       ${docViolationCountSql(Set("warning", "error", "fatal"))} AS v,
         |       ${docViolationCountSql(Set("warning"))} AS w,
         |       ${docViolationCountSql(Set("error", "fatal"))} AS e
         |      FROM $docsXSql)
         |GROUP BY lang""".stripMargin,
    "q_verdict_rollup_documents" ->
      s"""SELECT lang, CAST(GROUPING(lang) AS INT) AS is_total,
         | count(*) AS n_rows,
         | CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_rows,
         | CAST(SUM(v) AS BIGINT) AS n_violations,
         | CAST(SUM(w) AS BIGINT) AS n_warnings,
         | CAST(SUM(e) AS BIGINT) AS n_errors,
         | CASE WHEN SUM(e) > 0 THEN 'error'
         |      WHEN SUM(w) > 0 THEN 'warning'
         |      ELSE NULL END AS worst_severity,
         | SUM(e) = 0 AS pass
         |FROM (SELECT lang,
         |       ${docViolationCountSql(Set("warning", "error", "fatal"))} AS v,
         |       ${docViolationCountSql(Set("warning"))} AS w,
         |       ${docViolationCountSql(Set("error", "fatal"))} AS e
         |      FROM $docsXSql)
         |GROUP BY ROLLUP(lang)""".stripMargin,
    "q_asof_events" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click' AND ts IS NOT NULL),
        |r AS (
        |  SELECT user_id, ts, max(value) AS purchase_value FROM events
        |  WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY 1, 2)
        |SELECT l.user_id, l.event_id, l.ts, r.purchase_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "q_sessions_events" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |   CASE WHEN lag(ts) OVER w IS NULL
        |     OR date_diff('second', lag(ts) OVER w, ts) > 3600 THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |x AS (
        |  SELECT user_id, ts,
        |   sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM e)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts,
        | CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
        |FROM x GROUP BY 1, 2""".stripMargin,
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
    "q_quantiles_lineitem" ->
      """WITH g AS (
        | SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS q25,
        |  round(quantile_cont(l_quantity, 0.50), 6) AS q50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS q75,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS q95
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(0.25 AS DOUBLE) AS q, q25 AS value FROM g
        |UNION ALL SELECT l_returnflag, 0.50, q50 FROM g
        |UNION ALL SELECT l_returnflag, 0.75, q75 FROM g
        |UNION ALL SELECT l_returnflag, 0.95, q95 FROM g""".stripMargin,
    "q_outliers_lineitem" ->
      """WITH v AS (
        | SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS price
        | FROM lineitem),
        |b AS (
        | SELECT l_returnflag,
        |  quantile_cont(price, 0.25) AS q1, quantile_cont(price, 0.75) AS q3
        | FROM v GROUP BY 1),
        |f AS (
        | SELECT l_returnflag, q1, q3,
        |  q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        | FROM b)
        |SELECT v.l_returnflag, count(price) AS n_values,
        | CAST(coalesce(sum(CASE WHEN price < lo OR price > hi
        |                        THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers,
        | round(q1, 6) AS q1, round(q3, 6) AS q3,
        | round(lo, 6) AS lo, round(hi, 6) AS hi
        |FROM v JOIN f USING (l_returnflag)
        |GROUP BY v.l_returnflag, q1, q3, lo, hi""".stripMargin,
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
    "q_salted_counts_lineitem" ->
      "SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1",
    "q_lenhist_documents" ->
      """SELECT lang, CAST(floor(length(text) / 50) AS BIGINT) AS bin,
        | count(*) AS n
        |FROM documents WHERE text IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "q_ri_orders_customer" ->
      """SELECT (SELECT count(*) FROM orders) AS n_rows,
        | (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_null_keys,
        | (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |   AND NOT EXISTS (SELECT 1 FROM customer c
        |                   WHERE c.c_custkey = o.o_custkey)) AS n_orphans""".stripMargin,
    // Identical to q_ri_orders_customer by construction: the bloom path
    // must not change the answer, only the shuffle volume.
    "q_ri_bloom_orders_customer" ->
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
    "q_drift_categorical_documents" ->
      """WITH cur AS (
        |  SELECT lang, source AS category, count(*) AS n_cur FROM documents
        |  WHERE source IS NOT NULL AND doc_id % 2 = 0 GROUP BY 1, 2),
        |base AS (
        |  SELECT lang, source AS category, count(*) AS n_base FROM documents
        |  WHERE source IS NOT NULL AND doc_id % 2 = 1 GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(cur.lang, base.lang) AS lang,
        |   coalesce(cur.category, base.category) AS category,
        |   CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur,
        |   CAST(coalesce(n_base, 0) AS BIGINT) AS n_base
        |  FROM cur FULL OUTER JOIN base
        |   ON cur.lang = base.lang AND cur.category = base.category),
        |f AS (
        |  SELECT lang, category, n_cur, n_base,
        |   n_cur / CAST(sum(n_cur) OVER (PARTITION BY lang) AS DOUBLE) AS p,
        |   n_base / CAST(sum(n_base) OVER (PARTITION BY lang) AS DOUBLE) AS q
        |  FROM j)
        |SELECT lang, CAST(sum(n_cur) AS BIGINT) AS n_cur,
        | CAST(sum(n_base) AS BIGINT) AS n_base,
        | round(sum((greatest(p, 1e-6) - greatest(q, 1e-6)) * ln(greatest(p, 1e-6) / greatest(q, 1e-6))), 6) AS psi,
        | round(sum(abs(p - q)) / 2, 6) AS tv
        |FROM f GROUP BY lang""".stripMargin,
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
        |FROM t GROUP BY event_type""".stripMargin,

    "q_drift_auto_events" ->
      """WITH ed AS (
        |  SELECT quantile_cont(CAST(value AS DOUBLE), 0.25) AS e1,
        |         quantile_cont(CAST(value AS DOUBLE), 0.50) AS e2,
        |         quantile_cont(CAST(value AS DOUBLE), 0.75) AS e3
        |  FROM events WHERE value IS NOT NULL AND event_id % 2 = 1),
        |cur AS (
        |  SELECT event_type,
        |   CAST((CASE WHEN CAST(value AS DOUBLE) >= (SELECT e1 FROM ed) THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(value AS DOUBLE) >= (SELECT e2 FROM ed) THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(value AS DOUBLE) >= (SELECT e3 FROM ed) THEN 1 ELSE 0 END) AS BIGINT) AS bin,
        |   count(*) AS n_cur
        |  FROM events WHERE value IS NOT NULL AND event_id % 2 = 0 GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type,
        |   CAST((CASE WHEN CAST(value AS DOUBLE) >= (SELECT e1 FROM ed) THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(value AS DOUBLE) >= (SELECT e2 FROM ed) THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(value AS DOUBLE) >= (SELECT e3 FROM ed) THEN 1 ELSE 0 END) AS BIGINT) AS bin,
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
        |FROM t GROUP BY event_type""".stripMargin,

    // --- text analysis -------------------------------------------------
    "q_tokens_documents" ->
      """SELECT doc_id,
        | CAST(CASE WHEN text IS NULL THEN NULL
        |  WHEN length(trim(text)) = 0 THEN 0
        |  ELSE len(regexp_extract_all(trim(text), '\S+')) END AS BIGINT) AS n_tokens_ws,
        | CAST(CASE WHEN text IS NULL THEN NULL
        |  ELSE len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) END AS BIGINT) AS n_tokens_bpe
        |FROM documents""".stripMargin,
    "q_langid_documents" ->
      """WITH s AS (
        | SELECT doc_id, text,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|with|a)\b')) AS s_en,
        |  len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|nicht|ein|mit|von|zu)\b')) AS s_de,
        |  len(regexp_extract_all(lower(text), '\b(el|la|los|que|y|en|un|por|con|se)\b')) AS s_es,
        |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|en|un|du|est|que)\b')) AS s_fr,
        |  len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk
        | FROM documents)
        |SELECT doc_id, CAST(s_en AS BIGINT) AS s_en, CAST(s_de AS BIGINT) AS s_de,
        | CAST(s_es AS BIGINT) AS s_es, CAST(s_fr AS BIGINT) AS s_fr,
        | CASE WHEN text IS NULL THEN NULL
        |  WHEN cjk > 0 THEN 'zh'
        |  WHEN s_en = 0 AND s_de = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'
        |  WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |  WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |  WHEN s_es >= s_fr THEN 'es'
        |  ELSE 'fr' END AS lang_pred
        |FROM s""".stripMargin,
    "q_quality_documents" ->
      """WITH f AS (
        | SELECT doc_id,
        |  length(text) AS n_chars_txt,
        |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        |  length(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) AS n_punct,
        |  CASE WHEN text IS NULL THEN NULL
        |   WHEN length(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_extract_all(trim(text), '\S+')) END AS n_tokens,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|with|a)\b')) AS n_stop
        | FROM documents),
        |r AS (
        | SELECT doc_id, n_chars_txt, n_tokens,
        |  CASE WHEN n_chars_txt > 0 THEN n_alpha / CAST(n_chars_txt AS DOUBLE) ELSE 0 END AS alpha_ratio,
        |  CASE WHEN n_chars_txt > 0 THEN n_punct / CAST(n_chars_txt AS DOUBLE) ELSE 0 END AS punct_ratio,
        |  CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END AS stop_ratio
        | FROM f)
        |SELECT doc_id, CAST(n_chars_txt AS BIGINT) AS n_chars_txt,
        | CAST(n_tokens AS BIGINT) AS n_tokens,
        | round(alpha_ratio, 6) AS alpha_ratio,
        | round(punct_ratio, 6) AS punct_ratio,
        | round(stop_ratio, 6) AS stop_ratio,
        | round(0.4 * alpha_ratio + 0.3 * least(1.0, stop_ratio * 4)
        |       + 0.3 * least(1.0, n_tokens / 50.0), 6) AS quality
        |FROM r""".stripMargin,
    "q_fingerprint_documents" ->
      """SELECT doc_id,
        | sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_sha,
        | substring(sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16) AS fp64
        |FROM documents""".stripMargin,
    "q_repetition_documents" ->
      """WITH d AS (
        | SELECT doc_id, text,
        |  CASE WHEN text IS NULL THEN NULL
        |   ELSE list_filter(
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |    x -> length(x) > 0)
        |  END AS ws
        | FROM documents),
        |b AS (
        | SELECT doc_id, text, ws,
        |  CASE WHEN ws IS NULL THEN NULL
        |   ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
        |  END AS bg
        | FROM d),
        |wtf AS (
        | SELECT doc_id, max(c) AS top_w FROM (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(ws) AS tok FROM d) GROUP BY 1, 2)
        | GROUP BY 1),
        |btf AS (
        | SELECT doc_id, max(c) AS top_b FROM (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(bg) AS tok FROM b) GROUP BY 1, 2)
        | GROUP BY 1)
        |SELECT b.doc_id,
        | CAST(len(ws) AS BIGINT) AS n_words,
        | CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
        | CASE WHEN text IS NULL THEN NULL WHEN len(ws) > 0
        |  THEN round((len(ws) - len(list_distinct(ws))) / CAST(len(ws) AS DOUBLE), 6)
        |  ELSE 0.0 END AS dup_word_frac,
        | CASE WHEN text IS NULL THEN NULL WHEN len(ws) > 0
        |  THEN round(coalesce(top_w, 0) / CAST(len(ws) AS DOUBLE), 6)
        |  ELSE 0.0 END AS top_word_frac,
        | CASE WHEN text IS NULL THEN NULL WHEN len(bg) > 0
        |  THEN round(coalesce(top_b, 0) / CAST(len(bg) AS DOUBLE), 6)
        |  ELSE 0.0 END AS top_bigram_frac,
        | CASE WHEN text IS NULL THEN NULL WHEN length(text) > 0
        |  THEN round(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) / CAST(length(text) AS DOUBLE), 6)
        |  ELSE 0.0 END AS symbol_ratio
        |FROM b LEFT JOIN wtf ON wtf.doc_id = b.doc_id
        |       LEFT JOIN btf ON btf.doc_id = b.doc_id""".stripMargin,
    "q_redact_documents" ->
      """WITH p AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN text || ' reach user' || CAST(doc_id AS VARCHAR)
        |         || '@example.com or https://site' || CAST(doc_id AS VARCHAR)
        |         || '.example.org/p?id=' || CAST(doc_id AS VARCHAR)
        |       WHEN doc_id % 3 = 1 THEN text || ' host 10.0.'
        |         || CAST(doc_id % 256 AS VARCHAR) || '.25 acct 900000000'
        |         || CAST(doc_id AS VARCHAR)
        |       ELSE text END AS t
        | FROM documents)
        |SELECT doc_id,
        | CASE WHEN t IS NULL THEN NULL
        |  ELSE CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) END AS n_url,
        | CASE WHEN t IS NULL THEN NULL
        |  ELSE CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) END AS n_email,
        | CASE WHEN t IS NULL THEN NULL
        |  ELSE CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) END AS n_ipv4,
        | CASE WHEN t IS NULL THEN NULL
        |  ELSE CAST(len(regexp_extract_all(t, '\b[0-9]{9,}\b')) AS BIGINT) END AS n_id_digits,
        | regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |   'https?://[^\s]+', '<URL>', 'g'),
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |   '\b[0-9]{9,}\b', '<ID>', 'g') AS text_redacted
        |FROM p""".stripMargin,
    "q_toptokens_documents" ->
      """WITH tok AS (
        | SELECT unnest(list_filter(
        |   string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |   x -> length(x) > 0)) AS token
        | FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1)
        |SELECT token, n,
        | CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS BIGINT) AS rank
        |FROM c ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,

    "q_pipeline_documents" ->
      s"""WITH v AS (
         | SELECT * FROM $docsXSql
         | WHERE (${docViolationCountSql(Set("error", "fatal"))}) = 0),
         |d AS (
         | SELECT * FROM (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
         |    ORDER BY doc_id) AS rn
         |  FROM v)
         | WHERE rn = 1),
         |q AS (
         | SELECT * FROM (
         |  SELECT *,
         |   0.4 * (CASE WHEN length(text) > 0
         |          THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / CAST(length(text) AS DOUBLE)
         |          ELSE 0 END)
         |   + 0.3 * least(1.0, (CASE WHEN ntok > 0 THEN nstop / CAST(ntok AS DOUBLE) ELSE 0 END) * 4)
         |   + 0.3 * least(1.0, ntok / 50.0) AS quality
         |  FROM (SELECT *,
         |         CASE WHEN length(trim(text)) = 0 THEN 0
         |          ELSE len(regexp_extract_all(trim(text), '\\S+')) END AS ntok,
         |         len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|that|for|it|with|a)\\b')) AS nstop
         |        FROM d))
         | WHERE quality >= 0.5),
         |s AS (
         | SELECT * FROM q
         | WHERE CAST('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000
         |  < CASE lang WHEN 'en' THEN 500000 ELSE 1000000 END),
         |p AS (
         | SELECT pack_bucket, CAST(floor((cum - w) / 2000.0) AS BIGINT) AS pack_id
         | FROM (
         |  SELECT pack_bucket, w,
         |   sum(w) OVER (PARTITION BY pack_bucket ORDER BY doc_id
         |                ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM (SELECT doc_id, length(text) AS w,
         |         CAST(CAST('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000 % 16 AS INT) AS pack_bucket
         |        FROM s WHERE doc_id IS NOT NULL AND length(text) > 0)))
         |SELECT '0_input' AS stage, count(*) AS n_rows FROM documents
         |UNION ALL SELECT '1_validated', count(*) FROM v
         |UNION ALL SELECT '2_deduped', count(*) FROM d
         |UNION ALL SELECT '3_quality', count(*) FROM q
         |UNION ALL SELECT '4_sampled', count(*) FROM s
         | WHERE doc_id IS NOT NULL AND length(text) > 0
         |UNION ALL SELECT '5_packs', count(*) FROM (SELECT DISTINCT pack_bucket, pack_id FROM p)""".stripMargin,
    "q_pack_documents" ->
      """WITH nb AS (
        | SELECT CAST(least(greatest(CAST(ceil(count(*) / 100.0) AS BIGINT), 1), 65536) AS INT) AS n
        | FROM documents
        | WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0),
        |b AS (
        | SELECT doc_id, n_chars,
        |  CAST(CAST('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000 % (SELECT n FROM nb) AS INT) AS pack_bucket
        | FROM documents
        | WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0),
        |c AS (
        | SELECT doc_id, n_chars, pack_bucket,
        |  sum(n_chars) OVER (PARTITION BY pack_bucket ORDER BY doc_id
        |                     ROWS UNBOUNDED PRECEDING) AS cum
        | FROM b)
        |SELECT pack_bucket,
        | CAST(floor((cum - n_chars) / 2000.0) AS BIGINT) AS pack_id,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_weight
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q_sample_documents" ->
      """SELECT lang, count(*) AS n_kept FROM (
        | SELECT lang,
        |  CAST('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000 AS b
        | FROM documents)
        |WHERE b < (CASE lang WHEN 'en' THEN 250000 WHEN 'zh' THEN 500000
        |           ELSE 1000000 END)
        |GROUP BY lang""".stripMargin,
    // Identical semantics (and oracle) on the broadcast-join rate path.
    "q_sample_joined_documents" ->
      """SELECT lang, count(*) AS n_kept FROM (
        | SELECT lang,
        |  CAST('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000 AS b
        | FROM documents)
        |WHERE b < (CASE lang WHEN 'en' THEN 250000 WHEN 'zh' THEN 500000
        |           ELSE 1000000 END)
        |GROUP BY lang""".stripMargin,

    // region_hint is NULL (→ defaulted) when the doc is oversized OR
    // lang itself is null — coalesce over the full derivation, not the
    // sf0.01 data quirk of lang having no nulls.
    "q_normalize_documents" ->
      """SELECT doc_id, trim(text) AS text, lang,
        | coalesce(CASE WHEN n_chars <= 500 THEN lang END, 'unknown') AS region_hint,
        | source AS origin, n_chars,
        | CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END AS quality_bucket
        |FROM documents""".stripMargin,
    "q_normalize_actions_documents" ->
      """SELECT doc_id, 'region_hint' AS field, 'default' AS action,
        | 'unknown' AS value
        |FROM documents WHERE (CASE WHEN n_chars <= 500 THEN lang END) IS NULL
        |UNION ALL
        |SELECT doc_id, 'quality_bucket' AS field, 'default' AS action,
        | CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END AS value
        |FROM documents""".stripMargin,

    // Dotted-path normalization replayed per row, incl. the null-meta
    // slice where nothing is injected (null parent propagates).
    "q_normalize_nested_documents" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 31 <> 0
        |  THEN upper(coalesce(CASE WHEN n_chars <= 500 THEN lang END,
        |                      'unknown')) END AS region,
        | CASE WHEN doc_id % 31 <> 0 THEN n_chars END AS size,
        | CASE WHEN doc_id % 31 <> 0 THEN 'none' END AS origin_tag
        |FROM documents""".stripMargin,
    // Element 0 = (source, n_chars), element 1 = (lang, n_chars-200 or
    // defaulted 0) — the whole per-element transform replayed.
    "q_normalize_elements_documents" ->
      """SELECT doc_id, CAST(0 AS INT) AS idx, upper(source) AS name,
        | coalesce(n_chars, CAST(0 AS BIGINT)) AS n
        |FROM documents
        |UNION ALL
        |SELECT doc_id, CAST(1 AS INT), upper(lang),
        | coalesce(CASE WHEN n_chars <= 500 THEN n_chars - 200 END,
        |          CAST(0 AS BIGINT))
        |FROM documents""".stripMargin,

    "q_validate_items_documents" ->
      s"""SELECT doc_id, 'attrs' AS field, 'items' AS rule, '2' AS value,
        | 'error' AS severity
        |FROM documents WHERE coalesce(doc_id % 29 = 0, FALSE)
        |UNION ALL
        |SELECT doc_id, 'attrs[0]' AS field, 'items' AS rule, source AS value,
        | 'error' AS severity
        |FROM documents WHERE NOT coalesce(doc_id % 29 = 0, FALSE)
        | AND source IS NOT NULL
        | AND NOT regexp_full_match(source, 'src[0-9]{1,2}')
        |UNION ALL
        |SELECT doc_id, 'attrs[1]' AS field, 'items' AS rule, lang AS value,
        | 'error' AS severity
        |FROM documents WHERE NOT coalesce(doc_id % 29 = 0, FALSE)
        | AND lang IS NOT NULL AND lang NOT IN ('de','en','es','fr')
        |UNION ALL
        |SELECT doc_id, 'attrs[2]' AS field, 'items' AS rule,
        | size_tag AS value, 'error' AS severity
        |FROM $docsXSql WHERE NOT coalesce(doc_id % 29 = 0, FALSE)
        | AND size_tag IS NOT NULL
        | AND TRY_CAST(size_tag AS BIGINT) IS NULL""".stripMargin,

    "q_reservoir_documents" ->
      """SELECT lang, doc_id FROM (
        | SELECT lang, doc_id, row_number() OVER (PARTITION BY lang ORDER BY
        |   CAST('0x' || substring(md5(coalesce(CAST(doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000,
        |   doc_id) AS rk
        | FROM documents)
        |WHERE rk <= 7""".stripMargin,

    "q_induced_validate_documents" -> inducedValidateSql,
    "q_schema_merge_documents" -> schemaMergeSql,
    "q_repairs_documents" -> repairsSql,
    "q_repairs_grouped_documents" -> repairsSqlFor(grouped = true),
    "q_schema_diff_documents" -> schemaDiffSql,

    // Every suggest() formula replayed: single-row stat CTEs over the
    // two halves; conditional rows (induced uniqueness, distinct caps)
    // carry their base-slice guards as WHERE clauses; pass re-derived
    // from the re-derived bounds.
    "q_suggested_expectations_documents" -> suggestedExpectationsSql,

    "q_expectations_documents" ->
      """WITH g AS (
        | SELECT lang, CAST(count(*) AS DOUBLE) AS n,
        |  avg(CASE WHEN text IS NULL THEN 1.0 ELSE 0.0 END) AS nf,
        |  CAST(count(DISTINCT source) AS DOUBLE) AS nd,
        |  avg(CAST(n_chars AS DOUBLE)) AS mean_nc,
        |  max(CAST(n_chars AS DOUBLE)) AS max_nc,
        |  count(DISTINCT doc_id) / CAST(count(*) AS DOUBLE) AS uf_id,
        |  count(DISTINCT source) / CAST(count(*) AS DOUBLE) AS uf_src,
        |  quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med_nc
        | FROM documents GROUP BY lang)
        |SELECT lang, 'row_count' AS "check", '' AS "column",
        | CAST(NULL AS DOUBLE) AS q, n AS observed,
        | 50.0 AS lo, CAST('inf' AS DOUBLE) AS hi, n >= 50.0 AS pass FROM g
        |UNION ALL
        |SELECT lang, 'null_frac', 'text', CAST(NULL AS DOUBLE), nf,
        | CAST('-inf' AS DOUBLE), 0.1, nf <= 0.1 FROM g
        |UNION ALL
        |SELECT lang, 'distinct', 'source', CAST(NULL AS DOUBLE), nd, 10.0,
        | 30.0, nd >= 10.0 AND nd <= 30.0 FROM g
        |UNION ALL
        |SELECT lang, 'mean', 'n_chars', CAST(NULL AS DOUBLE), mean_nc, 100.0,
        | 1000.0, mean_nc >= 100.0 AND mean_nc <= 1000.0 FROM g
        |UNION ALL
        |SELECT lang, 'max', 'n_chars', CAST(NULL AS DOUBLE), max_nc,
        | CAST('-inf' AS DOUBLE), 550.0, max_nc <= 550.0 FROM g
        |UNION ALL
        |SELECT lang, 'unique_frac', 'doc_id', CAST(NULL AS DOUBLE), uf_id,
        | 1.0, CAST('inf' AS DOUBLE), uf_id >= 1.0 FROM g
        |UNION ALL
        |SELECT lang, 'unique_frac', 'source', CAST(NULL AS DOUBLE), uf_src,
        | 0.9, CAST('inf' AS DOUBLE), uf_src >= 0.9 FROM g
        |UNION ALL
        |SELECT lang, 'quantile', 'n_chars', 0.5 AS q, med_nc, 100.0, 400.0,
        | med_nc >= 100.0 AND med_nc <= 400.0 FROM g""".stripMargin,

    // Both snapshot aggregations + the full-outer group alignment +
    // every ratio/pass re-derived; NULL ratios (fr = no baseline,
    // de = vanished group) must FAIL their bounded checks.
    "q_expectations_rel_documents" -> {
      def arm(check: String, column: String, c: String, b: String,
          lo: String, hi: String) =
        s"""SELECT grp, '$check' AS "check", '$column' AS "column",
           | $c AS "current", $b AS previous,
           | CASE WHEN $b IS NOT NULL AND $b <> 0 THEN $c / $b END AS observed,
           | $lo AS lo, $hi AS hi,
           | coalesce((CASE WHEN $b IS NOT NULL AND $b <> 0 THEN $c / $b END) >= $lo
           |  AND (CASE WHEN $b IS NOT NULL AND $b <> 0 THEN $c / $b END) <= $hi,
           |  FALSE) AS pass
           |FROM j""".stripMargin
      """WITH d AS (SELECT *, coalesce(lang, '__null__') AS grp,
        |  CASE WHEN n_chars <= 500 THEN lang END AS region_hint
        | FROM documents),
        |b AS (SELECT grp, CAST(count(*) AS DOUBLE) AS rc,
        |  avg(CASE WHEN region_hint IS NULL THEN 1.0 ELSE 0.0 END) AS nf,
        |  CAST(count(DISTINCT source) AS DOUBLE) AS nd,
        |  avg(CAST(n_chars AS DOUBLE)) AS mn
        | FROM d WHERE doc_id % 2 = 0 AND grp <> 'fr' GROUP BY grp),
        |c AS (SELECT grp, CAST(count(*) AS DOUBLE) AS rc,
        |  avg(CASE WHEN region_hint IS NULL THEN 1.0 ELSE 0.0 END) AS nf,
        |  CAST(count(DISTINCT source) AS DOUBLE) AS nd,
        |  avg(CAST(n_chars AS DOUBLE)) AS mn
        | FROM d WHERE doc_id % 2 = 1 AND grp <> 'de' GROUP BY grp),
        |j AS (SELECT coalesce(c.grp, b.grp) AS grp,
        |  c.rc AS c_rc, b.rc AS b_rc, c.nf AS c_nf, b.nf AS b_nf,
        |  c.nd AS c_nd, b.nd AS b_nd, c.mn AS c_mn, b.mn AS b_mn
        | FROM c FULL OUTER JOIN b ON c.grp = b.grp)
        |""".stripMargin +
        Seq(
          arm("row_count_rel", "", "c_rc", "b_rc", "0.5", "2.0"),
          arm("null_frac_rel", "region_hint", "c_nf", "b_nf", "0.25", "4.0"),
          arm("distinct_rel", "source", "c_nd", "b_nd", "0.5", "2.0"),
          arm("mean_rel", "n_chars", "c_mn", "b_mn", "0.9", "1.1")
        ).mkString("\nUNION ALL\n")
    },

    "q_rule_breakdown_documents" ->
      s"""SELECT field, rule, severity, count(*) AS n_violations,
        | count(DISTINCT value) AS n_distinct_values,
        | min(value) AS example_min, max(value) AS example_max,
        | min(TRY_CAST(value AS DOUBLE)) AS example_min_num,
        | max(TRY_CAST(value AS DOUBLE)) AS example_max_num
        |FROM ($docViolationsSql)
        |GROUP BY field, rule, severity""".stripMargin,

    "q_profile_documents" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map { f =>
        s"""SELECT '$f' AS field,
           | count(*) AS n_rows,
           | CAST(count(*) - count($f) AS BIGINT) AS n_null,
           | (count(*) - count($f)) / CAST(count(*) AS DOUBLE) AS null_frac,
           | count(DISTINCT $f) AS n_distinct,
           | CASE WHEN count($f) > 0
           |  THEN count(TRY_CAST($f AS DOUBLE)) / CAST(count($f) AS DOUBLE)
           | END AS numeric_frac,
           | min(TRY_CAST($f AS DOUBLE)) AS min_num,
           | max(TRY_CAST($f AS DOUBLE)) AS max_num,
           | CAST(min(length(CAST($f AS VARCHAR))) AS BIGINT) AS min_len,
           | CAST(max(length(CAST($f AS VARCHAR))) AS BIGINT) AS max_len
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "q_temperature_documents" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents
        |               WHERE lang IS NOT NULL GROUP BY 1),
        |thr AS (SELECT lang,
        |  round(pow(CAST((SELECT min(n) FROM counts) AS DOUBLE) / n, 0.5)
        |        * 1000000) AS t
        | FROM counts)
        |SELECT d.lang, count(*) AS n_kept
        |FROM documents d LEFT JOIN thr USING (lang)
        |WHERE CAST('0x' || substring(md5(coalesce(CAST(d.doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000
        |      < coalesce(t, 1000000)
        |GROUP BY d.lang""".stripMargin,
    // Identical semantics (and oracle) with the rates derived fully
    // in-plan and broadcast-joined (temperatureSampleDistributed).
    "q_temperature_joined_documents" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents
        |               WHERE lang IS NOT NULL GROUP BY 1),
        |thr AS (SELECT lang,
        |  round(pow(CAST((SELECT min(n) FROM counts) AS DOUBLE) / n, 0.5)
        |        * 1000000) AS t
        | FROM counts)
        |SELECT d.lang, count(*) AS n_kept
        |FROM documents d LEFT JOIN thr USING (lang)
        |WHERE CAST('0x' || substring(md5(coalesce(CAST(d.doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000
        |      < coalesce(t, 1000000)
        |GROUP BY d.lang""".stripMargin,

    "q_budget_documents" ->
      """WITH f AS (
        | SELECT doc_id,
        |  length(text) AS n_chars_txt,
        |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        |  CASE WHEN text IS NULL THEN NULL
        |   WHEN length(trim(text)) = 0 THEN 0
        |   ELSE len(regexp_extract_all(trim(text), '\S+')) END AS n_tokens,
        |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for|it|with|a)\b')) AS n_stop
        | FROM documents),
        |r AS (
        | SELECT doc_id, n_tokens,
        |  round(0.4 * (CASE WHEN n_chars_txt > 0 THEN n_alpha / CAST(n_chars_txt AS DOUBLE) ELSE 0 END)
        |   + 0.3 * least(1.0, (CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0 END) * 4)
        |   + 0.3 * least(1.0, n_tokens / 50.0), 6) AS quality_r
        | FROM f),
        |sel AS (
        | SELECT r.doc_id,
        |  sum(r.n_tokens) OVER (ORDER BY r.quality_r DESC,
        |   CAST('0x' || substring(md5(coalesce(CAST(r.doc_id AS VARCHAR), '__NULL_KEY__') || ':42'), 1, 8) AS UBIGINT) % 1000000,
        |   r.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM r
        | WHERE r.quality_r IS NOT NULL AND r.n_tokens IS NOT NULL)
        |SELECT s.doc_id, d.lang FROM sel s JOIN documents d USING (doc_id)
        |WHERE s.cum <= 20000""".stripMargin,

    // --- deduplication -------------------------------------------------
    "q_dedup_exact_documents" ->
      """SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_distinct,
        | CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_dup_rows
        |FROM (SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
        |       count(*) AS n
        |      FROM documents WHERE text IS NOT NULL GROUP BY 1)""".stripMargin,
    "q_jaccard_pairs_documents" ->
      s"""WITH $jaccardCtes
        |SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
        | CAST(size_a AS BIGINT) AS size_a, CAST(size_b AS BIGINT) AS size_b,
        | round(jaccard, 6) AS jaccard
        |FROM jp WHERE jaccard >= 0.5""".stripMargin,
    "q_contamination_documents" ->
      s"""WITH $contaminationCtes
        |SELECT probe_id, corpus_id, CAST(n_common AS BIGINT) AS n_common,
        | CAST(probe_size AS BIGINT) AS probe_size,
        | round(containment, 6) AS containment
        |FROM cpj WHERE containment >= 0.4""".stripMargin,
    "q_contaminated_probes_documents" ->
      s"""WITH $contaminationCtes,
        |r AS (
        | SELECT probe_id, corpus_id, n_common, containment,
        |  row_number() OVER (PARTITION BY probe_id
        |    ORDER BY containment DESC, n_common DESC, corpus_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY probe_id) AS n_matches
        | FROM cpj WHERE containment >= 0.4)
        |SELECT probe_id, CAST(n_matches AS BIGINT) AS n_matches,
        | round(containment, 6) AS max_containment,
        | corpus_id AS best_corpus_id
        |FROM r WHERE rn = 1""".stripMargin,
    // Transitive closure of the jaccard pair graph via a recursive CTE:
    // walk enumerates (node, reachable-node) over the symmetric edges;
    // min per node = the component's minimum id (the engine's label).
    "q_cluster_documents" ->
      s"""WITH RECURSIVE $jaccardCtes,
        |e AS (
        |  SELECT id_a AS src, id_b AS dst FROM jp WHERE jaccard >= 0.5
        |  UNION
        |  SELECT id_b AS src, id_a AS dst FROM jp WHERE jaccard >= 0.5),
        |walk(id, lab) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e2.dst, w2.lab FROM walk w2 JOIN e e2 ON e2.src = w2.id),
        |cc AS (SELECT id, min(lab) AS component FROM walk GROUP BY id)
        |SELECT id AS doc_id, component,
        | count(*) OVER (PARTITION BY component) AS n_members
        |FROM cc""".stripMargin,

    // --- embedding similarity ------------------------------------------
    "q_ann_topk_embeddings" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 10),
        |s AS (SELECT q.q_id, e.vec_id,
        |  CASE WHEN sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(e.v, e.v)) = 0
        |   THEN 0.0
        |   ELSE list_dot_product(q.q_vec, e.v) /
        |    (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(e.v, e.v))) END AS c
        | FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        |r AS (SELECT q_id, vec_id, c,
        |  row_number() OVER (PARTITION BY q_id ORDER BY c DESC, vec_id ASC) AS rank
        | FROM s)
        |SELECT q_id, vec_id, round(c, 6) AS cos_sim, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 5""".stripMargin,
    "q_neardup_embeddings" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) = 0
        |   THEN 0.0
        |   ELSE list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) END AS c
        | FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(c, 6) AS cos_sim FROM p WHERE c >= 0.35""".stripMargin,

    // --- multimodal ----------------------------------------------------
    // Reads the SAME materialized parquet as the Spark query (fixed
    // path, deterministic content). DuckDB 1.0 sha256 is VARCHAR-only,
    // so distinct-content is counted on the raw BLOB — equal to Spark's
    // countDistinct(sha2(bytes, 256)) since sha256 is injective on this
    // data (collision would also fail the n_distinct compare).
    "q_multimodal_meta" ->
      s"""SELECT kind, count(*) AS n_media,
         | CAST(sum(octet_length(bytes)) AS BIGINT) AS total_bytes,
         | CAST(min(octet_length(bytes)) AS INT) AS min_bytes,
         | CAST(max(octet_length(bytes)) AS INT) AS max_bytes,
         | count(DISTINCT bytes) AS n_distinct
         |FROM read_parquet('$mediaPath/*.parquet')
         |GROUP BY kind""".stripMargin,
    // Stub decode replay: width/height from the first two bytes
    // (b & 0x7f ≡ b % 128 on 0..255; bytes sliced via the hex string —
    // DuckDB 1.0 substring has no BLOB overload), channels by kind.
    // Blocks are always ≥ 32 bytes so bytes 1..2 exist.
    "q_multimodal_decode" ->
      s"""SELECT media_id,
         | CAST(16 + (CAST('0x' || substring(hex(bytes), 1, 2) AS INT) % 128) * 8 AS INT) AS width,
         | CAST(16 + (CAST('0x' || substring(hex(bytes), 3, 2) AS INT) % 128) * 8 AS INT) AS height,
         | CAST(CASE WHEN kind = 'image' THEN 3 ELSE 1 END AS INT) AS channels,
         | CAST(octet_length(bytes) AS BIGINT) AS size_bytes
         |FROM read_parquet('$mediaPath/*.parquet')""".stripMargin,
    // Full generator replay: per-video frame count (media_id % 8 + 1)
    // and 40 ms spacing, one row per (video, frame index).
    "q_multimodal_frames" ->
      s"""SELECT media_id, CAST(g AS INT) AS frame_idx,
         | CAST(g * 40 AS INT) AS frame_ts_ms
         |FROM (SELECT media_id, unnest(range(0, media_id % 8 + 1)) AS g
         |      FROM read_parquet('$mediaPath/*.parquet')
         |      WHERE kind = 'video')""".stripMargin
  )
}
