package graft.compile

import graft.schema.{FieldSpec, Schema, Severity}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Compiles a declarative [[graft.schema.Schema]] into Catalyst `Column`
  * expressions — pure built-in functions, zero UDFs, so every rule stays
  * inside whole-stage codegen.
  *
  * Output surfaces:
  *   - [[violationStructs]]: one `when(fail, struct(field, rule, value))
  *     .otherwise(null)` per compiled rule — explode + filter-not-null
  *     downstream (codegen-friendly; avoids higher-order functions).
  *   - [[violationCount]]: integer sum of rule-failure flags — lets the
  *     verdict rollup run without materializing violation rows.
  */
object RuleCompiler {

  /** One compiled rule: the violation predicate (true = violation), the
    * normalized value to report (both as Catalyst columns), and the
    * severity channel the failure reports on.
    */
  final case class CompiledRule(
      field: String,
      rule: String,
      fails: Column,
      value: Column,
      severity: String = Severity.Error
  ) {
    def failing: Boolean = Severity.rank(severity) >= Severity.failingRank
  }

  /** Normalized view of a field (identity when no normalizer given). */
  private def normalized(name: String, spec: FieldSpec): Column =
    spec.normalize.fold(col(name))(f => f(col(name)))

  /** Compile every rule of every field. All rules are emitted — the
    * engine never short-circuits on the first failure (reference
    * semantics, see RuleDsl scaladoc).
    */
  def compile(schema: Schema): Seq[CompiledRule] =
    schema.fields.flatMap { case (name, spec) => compileField(name, spec) }

  private def compileField(name: String, spec: FieldSpec): Seq[CompiledRule] = {
    val v = normalized(name, spec)
    val vStr = v.cast(StringType)
    val isNull = v.isNull
    val nonNull = v.isNotNull
    def rule(r: String, fails: Column, value: Column = vStr) =
      CompiledRule(name, r, fails, value,
        spec.ruleSeverity.getOrElse(r, spec.severity))

    val nullRules = Seq(
      if (spec.required) Some(rule("required", isNull)) else None,
      if (!spec.nullable && !spec.required) Some(rule("nullable", isNull))
      else None
    ).flatten

    val valueRules = Seq(
      if (spec.notEmpty) Some(rule("empty", nonNull && trim(vStr) === ""))
      else None,
      spec.dtype.map { t =>
        // Cerberus `type`: value must be interpretable as the target type
        // (try_cast-and-compare; a failed cast yields null — ANSI-safe).
        rule("type", nonNull && v.try_cast(t).isNull)
      },
      spec.regex.map { p =>
        // Whole-string anchoring, like the reference's `matches` (not
        // `find`) at app/.../TotpUtil.kt:28.
        rule("regex", nonNull && !regexp_like(vStr, lit(anchor(p))))
      },
      spec.allowed.map { vals =>
        rule("allowed", nonNull && !v.isin(vals: _*))
      },
      spec.forbidden.map { vals =>
        // Cerberus `forbidden`: the complement of `allowed` — listed
        // values are rejected, everything else passes.
        rule("forbidden", nonNull && v.isin(vals: _*))
      },
      spec.min.map(m => rule("min", nonNull && v < lit(m))),
      spec.max.map(m => rule("max", nonNull && v > lit(m))),
      spec.minLength.map(m => rule("minlength", nonNull && length(vStr) < lit(m))),
      spec.maxLength.map(m => rule("maxlength", nonNull && length(vStr) > lit(m)))
    ).flatten

    val depRule =
      if (spec.dependencies.isEmpty) Nil
      else {
        val unsatisfied = spec.dependencies
          .map { case (depField, allowedVals) =>
            val d = col(depField)
            if (allowedVals.isEmpty) d.isNull
            else d.isNull || !d.isin(allowedVals: _*)
          }
          .reduce(_ || _)
        Seq(rule("dependencies", nonNull && unsatisfied))
      }

    val customRules = spec.checks.map { c =>
      CompiledRule(name, c.rule, nonNull && !coalesce(c.pass(v), lit(false)),
        vStr, spec.ruleSeverity.getOrElse(c.rule, c.severity))
    }

    nullRules ++ valueRules ++ depRule ++ customRules
  }

  /** Regexes anchor the whole string unless the author anchored them. */
  private def anchor(p: String): String = {
    val pre = if (p.startsWith("^")) "" else "^"
    val post = if (p.endsWith("$")) "" else "$"
    pre + p + post
  }

  /** One nullable struct per rule: `struct(field, rule, value)` when the
    * rule fails, null otherwise. Explode + `isNotNull` filter stays in
    * one codegen stage.
    */
  def violationStructs(schema: Schema): Seq[Column] =
    compile(schema).map { r =>
      when(
        r.fails,
        struct(
          lit(r.field).as("field"),
          lit(r.rule).as("rule"),
          r.value.as("value"),
          lit(r.severity).as("severity")
        )
      )
    }

  /** Array of all (nullable) violation structs for a row. */
  def violationsArray(schema: Schema): Column =
    array(violationStructs(schema): _*)

  /** Number of failed rules for a row — plain integer arithmetic, fully
    * codegen'd, no array materialization.
    */
  def violationCount(schema: Schema): Column = countWhere(schema, _ => true)

  /** Failures on a failing channel (severity ≥ error) — the count that
    * decides pass/fail; warnings are reported but don't fail.
    */
  def errorCount(schema: Schema): Column = countWhere(schema, _.failing)

  /** Failures below the failing threshold (the warn channel). */
  def warningCount(schema: Schema): Column = countWhere(schema, r => !r.failing)

  private def countWhere(schema: Schema, p: CompiledRule => Boolean): Column =
    compile(schema)
      .filter(p)
      .map(r => when(r.fails, 1).otherwise(0))
      .reduceOption(_ + _)
      .getOrElse(lit(0))

  /** Worst severity rank of the row's failed rules (-1 = clean row) —
    * integer max, codegen'd; feeds the per-partition worst-severity
    * rollup (reference channel semantics, app/.../HomeViewModel.kt:
    * 179-185).
    */
  def worstSeverityRank(schema: Schema): Column =
    compile(schema)
      .map(r => when(r.fails, lit(Severity.rank(r.severity))).otherwise(lit(-1)))
      .reduceOption(greatest(_, _))
      .getOrElse(lit(-1))

  /** Map a severity rank column back to its name (null for -1). */
  def severityName(rank: Column): Column =
    Severity.rank.foldLeft(lit(null).cast(StringType)) { case (acc, (name, r)) =>
      when(rank === r, lit(name)).otherwise(acc)
    }
}
