package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over keyed event streams: as-of join and
  * gap-based sessionization. Both are single-shuffle plans — one
  * exchange keyed by the entity id, then per-partition window sorts —
  * the shape that survives a 1000-executor scale-up (no driver loops,
  * no cross joins, state bounded per key).
  *
  * Semantics grounding: the reference maintains a keyed
  * latest-value-per-entity view refreshed on a time tick
  * (app/.../HomeViewModel.kt:46-47, 61-81) — the as-of join is exactly
  * "the latest right-side value as of each left timestamp", and the
  * TOTP window counter (rust/src/lib.rs:192) is the fixed-window
  * degenerate case of gap-based sessions.
  */
object Temporal {

  /** As-of join: for every left row, the single most recent right row
    * with `rightTs <= leftTs` within the same key group (classic
    * point-in-time / "no peeking into the future" join). Right-side
    * value columns come back null when no prior right row exists.
    *
    * Plan: union both sides tagged by origin, one shuffle on `keyCols`,
    * then `last(right_struct, ignoreNulls) OVER (ORDER BY ts, origin)`
    * — right rows at the same timestamp sort BEFORE left rows so
    * equality counts as "at or before". No join explosion: cost is the
    * sort, O((|L|+|R|) log) per key partition.
    *
    * Right rows must be unique per (key, ts) — pre-aggregate the right
    * side otherwise (which of several same-instant rows is "the" value
    * is ambiguous in any as-of semantics). Right rows with a null
    * timestamp are dropped (a null instant can never be "at or before"
    * anything — matching SQL ASOF semantics, where a null comparison
    * never matches); left rows with a null timestamp come back with
    * null value columns for the same reason.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    val leftPayload =
      left.columns.filterNot(c => keyCols.contains(c) || c == leftTs).toSeq
    // Output-shape guards: a left payload column sharing a name with a
    // right value column would produce duplicate output columns, and the
    // internal __-tags would silently collide with same-named payload.
    val clash = leftPayload.intersect(valueCols)
    require(clash.isEmpty,
      s"left payload and right value columns collide on ${clash.mkString(", ")} " +
        "— rename one side before the as-of join")
    val reserved = leftPayload.intersect(Seq("__ts", "__origin", "__rval", "__asof"))
    require(reserved.isEmpty,
      s"left columns ${reserved.mkString(", ")} collide with asofJoin's " +
        "internal __-prefixed tags — rename them")
    val keyCs = keyCols.map(col)
    // origin: 0 = right (visible at equal ts), 1 = left.
    // Null right timestamps would sort FIRST (nulls-first asc) and leak
    // their value into every otherwise-unmatched left row — drop them.
    val taggedRight = right.where(col(rightTs).isNotNull).select(
      keyCs ++ Seq(col(rightTs).as("__ts"), lit(0).as("__origin"),
        struct(valueCols.map(col): _*).as("__rval")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      keyCs ++ Seq(col(leftTs).as("__ts"), lit(1).as("__origin"),
        lit(null).cast(taggedRight.schema("__rval").dataType).as("__rval")) ++
        leftPayload.map(col): _*)
    val w = Window
      .partitionBy(keyCs: _*)
      .orderBy(col("__ts").asc, col("__origin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__rval"), ignoreNulls = true).over(w))
      .where(col("__origin") === 1)
      .select(
        keyCs ++ leftPayload.map(col) :+ col("__ts").as(leftTs) :+
          col("__asof"): _*)
      .select(
        (keyCols ++ leftPayload :+ leftTs).map(col) ++
          valueCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Gap-based sessionization: events of one key belong to the same
    * session while consecutive gaps are ≤ `gapSeconds`; a larger gap
    * starts the next session. Adds `session_seq` (1-based per key,
    * ordered by time) to every event row. `tieBreak` makes the
    * within-key order total when timestamps collide (determinism).
    *
    * One shuffle on the key; boundary detection is lag + cumulative sum
    * inside the same window sort (no self-join, no state beyond the
    * window frame).
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = col(tsCol).asc +: tieBreak.map(col(_).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val gap = unix_timestamp(col(tsCol)) -
      lag(unix_timestamp(col(tsCol)), 1).over(w)
    val isNew = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    events.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: `(keyCol, session_seq, n_events, start_ts,
    * end_ts, duration_s)` — the rollup a session-based pipeline (e.g.
    * session dedup or per-session sampling) consumes.
    */
  def sessionSummary(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Seq[String] = Nil): DataFrame =
    sessionize(events, keyCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_s"))
}
