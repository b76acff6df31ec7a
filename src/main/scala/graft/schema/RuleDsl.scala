package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DataType

/** Declarative Cerberus-style schema DSL.
  *
  * Rule vocabulary (closed set, cf. the reference's closed error enum at
  * reference rust/src/lib.rs:28-46): `required`, `nullable`, `empty`,
  * `type`, `regex`, `allowed`, `forbidden`, `min`, `max`, `minlength`,
  * `maxlength`, `dependencies`, `contains`, `excludes`, the combinators
  * `anyof`/`allof`/`oneof`/`noneof`, map-column `keysrules`/
  * `valuesrules`, plus named custom checks (e.g. `check_sha256`).
  *
  * Semantics, pinned by `graft.ValidatorSpec`:
  *   - Normalization runs BEFORE every rule (coercion-first, cf. reference
  *     app/.../TotpUtil.kt:26 which uppercases+strips before the Base32
  *     regex). All rules see the normalized value; violation rows report
  *     the normalized value.
  *   - A null value fails `required` (if required) or `nullable` (if
  *     nullable=false); no other rule fires on null.
  *   - A non-null value is checked against EVERY applicable rule — all
  *     failures are reported, not just the first (cf. reference
  *     app/.../HomeScreen.kt:785-789 which accumulates all field errors
  *     in one pass).
  *   - `dependencies`: the field (when non-null) is only valid if each
  *     dependency field is non-null and, when an allowed-value list is
  *     given, its value is in that list.
  *   - `excludes`: the mutual-exclusion complement of `dependencies` —
  *     the field (when non-null) is only valid if every listed field IS
  *     null (public-Cerberus `excludes`).
  *   - `contains` (array columns): the array must contain EVERY listed
  *     value (public-Cerberus `contains` on containers).
  *   - Combinators take VALUE-ONLY sub-specs (see [[FieldSpec.valueOnly]])
  *     evaluated against the parent-normalized value: `anyof` fails when
  *     no sub-spec passes, `allof` when any fails, `noneof` when any
  *     passes, `oneof` unless exactly one passes. A combinator reports
  *     ONE violation on the PARENT field's channel — sub-spec rules are
  *     predicates, not reporters.
  *   - `keysrules` / `valuesrules` (map columns): every key / value of
  *     the map must pass a value-only sub-spec.
  *   - `items` (array columns, public-Cerberus positional rules): the
  *     array must have EXACTLY `items.length` elements (length mismatch
  *     reports ONE violation on the parent field, value = the actual
  *     size — Cerberus's "length of list should be N"); when the length
  *     matches, element i is checked against the value-only sub-spec
  *     `items(i)`, reporting on the INDEXED path `field[i]` (V13-style).
  *     A null ELEMENT passes (null handling is not a positional value
  *     rule's job — wrap the array field itself in `required` /
  *     `contains` rules for presence semantics). This is the
  *     tuple-shaped-list complement of the UNIFORM per-element
  *     validation in `Validator.elementViolations`.
  *
  * Normalization half (public-Cerberus's other half — applied by
  * `Validator.normalizeDocument`, NOT by the rule compiler; rules see
  * the frame as given plus their per-rule `normalize` pre-step):
  *   - `default`: a literal injected where the column is NULL (or the
  *     whole column is absent from the frame) — the frame analog of
  *     Cerberus's default-for-missing-key;
  *   - `defaultSetter`: a computed default (any Column expression over
  *     the OTHER columns of the frame — Cerberus `default_setter`
  *     receives the document); `defaultSetter` wins when both are set;
  *   - `rename`: the column arrives under THIS spec's field name and is
  *     renamed to `rename.get` (Cerberus `rename` — spec keyed by the
  *     old name); the spec's remaining normalization (defaults,
  *     `normalize`) applies to the renamed column.
  */
final case class FieldSpec(
    dtype: Option[DataType] = None,
    required: Boolean = false,
    nullable: Boolean = true,
    notEmpty: Boolean = false,
    regex: Option[String] = None,
    allowed: Option[Seq[String]] = None,
    forbidden: Option[Seq[String]] = None,
    min: Option[Double] = None,
    max: Option[Double] = None,
    minLength: Option[Int] = None,
    maxLength: Option[Int] = None,
    dependencies: Map[String, Seq[String]] = Map.empty,
    excludes: Seq[String] = Nil,
    contains: Option[Seq[Any]] = None,
    anyOf: Seq[FieldSpec] = Nil,
    allOf: Seq[FieldSpec] = Nil,
    oneOf: Seq[FieldSpec] = Nil,
    noneOf: Seq[FieldSpec] = Nil,
    keysRules: Option[FieldSpec] = None,
    valuesRules: Option[FieldSpec] = None,
    items: Seq[FieldSpec] = Nil,
    normalize: Option[Column => Column] = None,
    checks: Seq[CustomCheck] = Nil,
    severity: String = Severity.Error,
    ruleSeverity: Map[String, String] = Map.empty,
    default: Option[Any] = None,
    defaultSetter: Option[Column] = None,
    rename: Option[String] = None
) {
  (severity +: ruleSeverity.values.toSeq).foreach(Severity.requireKnown)
  // Keys too: a typo'd rule name would otherwise silently leave the rule
  // on its default channel — the misconfiguration severities exist to
  // prevent. Valid keys are the built-in rule vocabulary plus this
  // field's custom check names.
  private val knownRules = Set("required", "nullable", "empty", "type",
    "regex", "allowed", "forbidden", "min", "max", "minlength",
    "maxlength", "dependencies", "contains", "excludes", "anyof",
    "allof", "oneof", "noneof", "keysrules",
    "valuesrules", "items") ++ checks.map(_.rule)
  ruleSeverity.keys.foreach { k =>
    require(knownRules.contains(k),
      s"ruleSeverity key '$k' names no rule of this field " +
        s"(known: ${knownRules.toSeq.sorted.mkString(", ")})")
  }
  // Combinator / map-rule sub-specs are predicates over ONE value: any
  // row-level or reporting machinery inside them is a misconfiguration,
  // rejected here (E1: misconfig fails at construction, not mid-job).
  (anyOf.map(("anyof", _)) ++ allOf.map(("allof", _)) ++
    oneOf.map(("oneof", _)) ++ noneOf.map(("noneof", _)) ++
    keysRules.map(("keysrules", _)) ++ valuesRules.map(("valuesrules", _)) ++
    items.map(("items", _)))
    .foreach { case (rule, sub) =>
      require(sub.valueOnly,
        s"$rule sub-spec must be value-only: no required/nullable=false/" +
          "dependencies/excludes/nested combinators/keysrules/valuesrules/" +
          "items/normalize/defaults/rename/checks/ruleSeverity")
    }
  rename.foreach(to =>
    require(to.nonEmpty && !to.contains('.'),
      s"rename target '$to' must be a non-empty top-level column name"))

  /** True when this spec carries only simple value rules — the shape
    * combinator and keysrules/valuesrules/items sub-specs must have.
    */
  def valueOnly: Boolean =
    !required && nullable && dependencies.isEmpty && excludes.isEmpty &&
      anyOf.isEmpty && allOf.isEmpty && oneOf.isEmpty && noneOf.isEmpty &&
      keysRules.isEmpty && valuesRules.isEmpty && items.isEmpty &&
      normalize.isEmpty && checks.isEmpty && ruleSeverity.isEmpty &&
      default.isEmpty && defaultSetter.isEmpty && rename.isEmpty
}

/** Violation severity channels — closed, ordered vocabulary mirroring
  * the reference's three outcome channels (IllegalArgument /
  * IllegalState / other at app/.../HomeViewModel.kt:179-185). A
  * partition verdict rolls up to the WORST severity seen; only
  * `error`-and-above fail the partition (warnings are reported data).
  */
object Severity {
  val Warning = "warning"
  val Error = "error"
  val Fatal = "fatal"

  /** Ordering rank; -1 is reserved for "no violation". */
  val rank: Map[String, Int] = Map(Warning -> 0, Error -> 1, Fatal -> 2)

  val failingRank: Int = rank(Error)

  def requireKnown(s: String): Unit =
    require(rank.contains(s),
      s"unknown severity '$s' (closed vocabulary: ${rank.keys.mkString(", ")})")
}

/** A named custom per-row invariant; `pass` maps the (normalized) field
  * column to a boolean Column. Example: sha256(content) equality
  * (semantics grounding: hash-then-compare at reference
  * rust/src/lib.rs:161-172).
  */
final case class CustomCheck(
    rule: String,
    pass: Column => Column,
    severity: String = Severity.Error) {
  Severity.requireKnown(severity)
}

/** A schema is an ordered mapping field → spec. Order determines the
  * order of violation-struct slots (deterministic output).
  */
final case class Schema(fields: Seq[(String, FieldSpec)]) {
  def fieldNames: Seq[String] = fields.map(_._1)
}

object Schema {
  def of(fields: (String, FieldSpec)*): Schema = new Schema(fields.toSeq)
}
