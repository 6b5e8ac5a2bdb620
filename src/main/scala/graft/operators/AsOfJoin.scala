package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal latest-state) join — enrich every left event with the
 * most recent right row at or before its timestamp, per key. This is the
 * row-level form of the reference's metadata-enrichment fan-in (the
 * `FeatureCombinerOp` pairing of a frame with the freshest feature state,
 * `operator/FeatureCombinerOp.java:38-61`, and the per-host metadata
 * stream the north rule's stateful join consumes): each page/event picks
 * up the LATEST config/metadata snapshot visible at its event time, not a
 * window-banded equi-match ([[graft.streaming.PageStream]] q31) and not an
 * interval containment (q13).
 *
 * Physical shape — the union trick, NOT a range join: tag both inputs,
 * union them into one stream, hash-exchange ONCE on the key, sort
 * in-partition by `(ts, side)` (right rows first at equal ts, so a
 * same-microsecond snapshot is visible — DuckDB `ASOF ... ON l.ts >= r.ts`
 * semantics), then carry the right payload forward with a running
 * `last(_, ignoreNulls)` window frame. Cost at 100 TB: one shuffle of
 * |L|+|R| rows on the key + an in-partition sort; the running frame is
 * streaming (no per-row buffer growth). The alternatives both die at
 * scale: a range join explodes to every (event, older-snapshot) candidate
 * pair before picking the max, and a per-event max-subquery re-aggregates
 * the snapshot table once per probe.
 *
 * The right payload is carried as ONE struct, not per column — a matched
 * snapshot whose payload field is legitimately NULL must yield NULL, not
 * look through to an older snapshot's value (per-column `last(ignoreNulls)`
 * would). Right rows are first collapsed to one per `(key, ts)` by
 * `max(struct(payload))` — a partial-aggregating, order-independent
 * tie-break (the analog of q14's newest-capture rule) so duplicate
 * same-microsecond snapshots cannot make the join nondeterministic. Right
 * rows with NULL ts are dropped (never visible to any event — the DuckDB
 * comparison-with-NULL rule); left rows with NULL ts come back unmatched.
 *
 * Left rows keep their full schema; matched right payload columns are
 * appended (NULL when no snapshot precedes the event). Column names must
 * not collide between left and right payload (caller renames; `require`d).
 */
object AsOfJoin {

  /**
   * @param left     event side (kept whole, one output row per input row)
   * @param right    state side: key cols + `rightTs` + payload cols
   * @param keys     equi-key column names present in BOTH inputs
   * @param leftTs   event-time column on `left`
   * @param rightTs  event-time column on `right` (dropped from output)
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    require(keys.nonEmpty, "asOf needs at least one key column")
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(payloadCols.nonEmpty, "right side has no payload columns to carry")
    val leftCols = left.columns
    val collide = payloadCols.intersect(leftCols)
    require(collide.isEmpty,
      s"right payload collides with left columns: ${collide.mkString(",")} — rename first")

    val ts = "_asof_ts"
    val side = "_asof_side"
    val pay = "_asof_pay"
    val carried = leftCols.filterNot(c => keys.contains(c) || c == leftTs)

    // one snapshot row per (key, ts): deterministic max-struct tie-break,
    // keeps its PARTIAL phase (map-side collapse before the one exchange)
    val r1 = right.na.drop(Seq(rightTs))
      .groupBy((keys :+ rightTs).map(col): _*)
      .agg(max(struct(payloadCols.map(col): _*)).as(pay))
      .select(
        keys.map(col) ++ Seq(col(rightTs).as(ts), lit(0).as(side)) ++
          carried.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(col(pay)): _*)

    val l1 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as(ts), lit(1).as(side)) ++
        carried.map(col) ++
        Seq(lit(null).cast(r1.schema(pay).dataType).as(pay)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r1.unionByName(l1)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
      .where(col(side) === 1)
      .select(
        leftCols.map(c => if (c == leftTs) col(ts).as(leftTs) else col(c)) ++
          payloadCols.map(c => col(pay).getField(c).as(c)): _*)
  }
}
