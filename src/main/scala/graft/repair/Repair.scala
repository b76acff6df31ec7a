package graft.repair

import graft.compile.RuleCompiler
import graft.schema.{Schema, SchemaJson}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REPAIR induction — the bridge from violations back to normalization:
  * for every value rule a field declares and every candidate normalizer,
  * measure on the real corpus how many currently-violating values the
  * candidate would FIX and how many currently-passing values it would
  * BREAK. The reference's own import flow embodies the pattern — its
  * fix for shape-variant input is normalize-then-validate
  * (uppercase+strip before the Base32 check, reference
  * app/.../TotpUtil.kt:26); this operator discovers WHICH normalization
  * that should be, from data, instead of leaving it to folklore.
  *
  * Output: one row per (field, rule, normalizer) —
  * `(field, rule, normalizer, n_violations, n_repaired, n_broken)`.
  * The adoption signal is `n_repaired` high AND `n_broken = 0`; a
  * candidate that fixes one shape class while breaking another (e.g.
  * `lower` on a corpus validated against an uppercase allowed-list)
  * surfaces its cost instead of silently trading one violation class
  * for another. Verdicts are data (E4): adopt by setting
  * `FieldSpec(normalize = ...)` — or the JSON form's registry name —
  * and re-validating.
  *
  * Semantics: the baseline applies the spec's DECLARED rule semantics
  * (declared `normalize` included); each candidate composes AFTER the
  * declared normalize, so rows report what ADDING the candidate on top
  * of the existing spec would change. The scalar value rules
  * participate (`empty`/`type`/`regex`/`allowed`/`forbidden`/`min`/
  * `max`/`minlength`/`maxlength` — the same compiled predicates
  * validation runs, via RuleCompiler.valueRuleFails, so repair counts
  * can never disagree with violation counts; the array-typed
  * `contains` rule is excluded — string normalizers do not apply to
  * containers). Null values fail no value rule and so count nowhere,
  * exactly like validation.
  *
  * Domain: TOP-LEVEL STRING columns — normalizers are string
  * functions, so non-string fields are documented out of scope and
  * simply induce no rows; a schema field the frame LACKS, or a dotted
  * path, is a misconfiguration and fails at construction (E1 — the
  * same typo validation would fail loudly on).
  *
  * Scale: ONE global aggregation — O(fields × rules × (candidates+1))
  * codegen'd counters over a single scan (baseline violation counters
  * are shared across candidates, not recomputed per cell), zero
  * shuffle (partial + final aggregate), output O(cells) rows.
  */
object Repair {

  def suggestRepairs(
      df: DataFrame,
      schema: Schema,
      candidates: Map[String, Column => Column] =
        SchemaJson.builtinNormalizers,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(candidates.nonEmpty, "suggestRepairs needs at least one candidate")
    val cands = candidates.toSeq.sortBy(_._1)
    val frameTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    schema.fields.foreach { case (f, _) =>
      require(!f.contains('.'),
        s"suggestRepairs targets top-level columns; '$f' is a dotted path")
      require(frameTypes.contains(f),
        s"schema field '$f' is not a column of the frame " +
          s"(have: ${df.columns.mkString(", ")})")
    }
    val stringFields = schema.fields.filter { case (f, _) =>
      frameTypes(f) == org.apache.spark.sql.types.StringType
    }
    // Per (field, rule): the shared baseline predicate; per (field,
    // rule, candidate): the after-candidate predicate. `contains` is
    // array-typed — no string normalizer applies.
    val base: Seq[(String, String, Column)] = stringFields.flatMap {
      case (f, spec) =>
        val v0 = spec.normalize.map(_(col(f))).getOrElse(col(f))
        RuleCompiler.valueRuleFails(spec, v0).collect {
          case (rule, fails0) if rule != "contains" => (f, rule, fails0)
        }
    }
    require(base.nonEmpty,
      "schema declares no scalar value rules on string columns " +
        "— nothing a normalizer could repair")
    val baseIdx = base.zipWithIndex.map { case ((f, r, _), i) => (f, r) -> i }.toMap
    val baseByField = base.groupBy(_._1)
    val cells: Seq[(String, String, String, Int, Column, Column)] =
      stringFields.flatMap { case (f, spec) =>
        val v0 = spec.normalize.map(_(col(f))).getOrElse(col(f))
        val fieldBase = baseByField.getOrElse(f, Nil)
        cands.flatMap { case (name, fn) =>
          val after = RuleCompiler.valueRuleFails(spec, fn(v0)).toMap
          fieldBase.map { case (_, rule, fails0) =>
            (f, rule, name, baseIdx((f, rule)), fails0, after(rule))
          }
        }
      }
    val aggs =
      base.zipWithIndex.map { case ((_, _, f0), i) =>
        sum(when(f0, 1L).otherwise(0L)).as(s"__v$i")
      } ++
        cells.zipWithIndex.flatMap { case ((_, _, _, _, f0, f1), i) =>
          Seq(
            sum(when(f0 && !f1, 1L).otherwise(0L)).as(s"__r$i"),
            sum(when(!f0 && f1, 1L).otherwise(0L)).as(s"__b$i"))
        }
    // With groupCols, one repair report per group — "which normalizer
    // fixes which source/lang slice" (same single aggregation, keyed).
    val agged =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val rows = cells.zipWithIndex.map { case ((f, r, n, vi, _, _), i) =>
      struct(
        lit(f).as("field"),
        lit(r).as("rule"),
        lit(n).as("normalizer"),
        coalesce(col(s"__v$vi"), lit(0L)).as("n_violations"),
        coalesce(col(s"__r$i"), lit(0L)).as("n_repaired"),
        coalesce(col(s"__b$i"), lit(0L)).as("n_broken"))
    }
    agged.select(groupCols.map(col) :+ explode(array(rows: _*)).as("e"): _*)
      .select(groupCols.map(col) :+ col("e.*"): _*)
  }
}
