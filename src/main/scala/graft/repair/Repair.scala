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
  * of the existing spec would change. All value rules participate
  * (`empty`/`type`/`regex`/`allowed`/`forbidden`/`min`/`max`/
  * `minlength`/`maxlength` — the same compiled predicates validation
  * runs, via RuleCompiler.valueRuleFails, so repair counts can never
  * disagree with violation counts). Null values fail no value rule and
  * so count nowhere, exactly like validation.
  *
  * Scale: ONE global aggregation — O(fields × rules × candidates)
  * codegen'd counters over a single scan, zero shuffle (partial + final
  * aggregate), output O(cells) rows. Top-level fields only (repairs
  * target document columns; struct surgery is normalization's job
  * after adoption).
  */
object Repair {

  def suggestRepairs(
      df: DataFrame,
      schema: Schema,
      candidates: Map[String, Column => Column] =
        SchemaJson.builtinNormalizers): DataFrame = {
    require(candidates.nonEmpty, "suggestRepairs needs at least one candidate")
    val cands = candidates.toSeq.sortBy(_._1)
    val frameCols = df.columns.toSet
    // (field, rule, candidateName, failsBefore, failsAfter)
    val cells: Seq[(String, String, String, Column, Column)] =
      schema.fields
        .filter { case (f, _) => !f.contains('.') && frameCols.contains(f) }
        .flatMap { case (f, spec) =>
          val v0 = spec.normalize.map(_(col(f))).getOrElse(col(f))
          val before = RuleCompiler.valueRuleFails(spec, v0)
          cands.flatMap { case (name, fn) =>
            val after = RuleCompiler.valueRuleFails(spec, fn(v0)).toMap
            before.map { case (rule, fails0) =>
              (f, rule, name, fails0, after(rule))
            }
          }
        }
    require(cells.nonEmpty,
      "schema declares no value rules on top-level columns of this frame " +
        "— nothing a normalizer could repair")
    val aggs = cells.zipWithIndex.flatMap { case ((_, _, _, f0, f1), i) =>
      Seq(
        sum(when(f0, 1L).otherwise(0L)).as(s"__v$i"),
        sum(when(f0 && !f1, 1L).otherwise(0L)).as(s"__r$i"),
        sum(when(!f0 && f1, 1L).otherwise(0L)).as(s"__b$i"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val rows = cells.zipWithIndex.map { case ((f, r, n, _, _), i) =>
      struct(
        lit(f).as("field"),
        lit(r).as("rule"),
        lit(n).as("normalizer"),
        coalesce(col(s"__v$i"), lit(0L)).as("n_violations"),
        coalesce(col(s"__r$i"), lit(0L)).as("n_repaired"),
        coalesce(col(s"__b$i"), lit(0L)).as("n_broken"))
    }
    agged.select(explode(array(rows: _*)).as("e")).select(col("e.*"))
  }
}
