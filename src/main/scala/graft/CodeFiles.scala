package graft

import graft.data.SynthGen
import graft.schema.{CustomCheck, FieldSpec, Schema}
import org.apache.spark.sql.functions._

/** The canonical north-rule input schema: an Iceberg-shaped table of
  * source-code files `(repo, path, commit, lang, content)` plus the
  * per-row sha256 invariant against a companion `expected_sha` column
  * (BASELINE.json `input_hint`; hash-then-compare semantics grounded at
  * reference rust/src/lib.rs:161-172).
  */
object CodeFiles {

  val schema: Schema = Schema.of(
    "repo" -> FieldSpec(
      required = true,
      regex = Some("[A-Za-z0-9._-]+/[A-Za-z0-9._-]+")),
    "path" -> FieldSpec(required = true, notEmpty = true),
    "commit" -> FieldSpec(required = true, regex = Some("[0-9a-f]{40}")),
    "lang" -> FieldSpec(required = true, allowed = Some(SynthGen.langs)),
    "content" -> FieldSpec(
      required = true,
      checks = Seq(CustomCheck("check_sha256",
        v => sha2(v, 256) === col("expected_sha"))))
  )

  val keyCols: Seq[String] = Seq("repo", "path", "commit")
}
