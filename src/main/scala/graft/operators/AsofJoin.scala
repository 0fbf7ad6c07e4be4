package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the LAST right row (by `ts`) with
  * `right.ts <= left.ts` and equal keys — the standard time-series
  * enrichment operator (DuckDB/Kdb `ASOF JOIN`, Flink temporal join),
  * which Spark has no built-in for.
  *
  * Implemented as a composition Spark CAN express efficiently
  * (preference (a) of the custom-operator ladder): tag both sides,
  * union, and run one `last(_, ignoreNulls) OVER (PARTITION BY keys
  * ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)` — right rows
  * sort before left rows at equal ts, so the inclusive `<=` semantics
  * fall out of the sort. ONE shuffle on the keys, no join explosion,
  * no per-row subquery; at 100 TB this is the only shape that
  * survives — a range-condition join would rescan the right side per
  * left row, and windowing keeps each key's timeline together, which
  * AQE can further split on skewed keys.
  *
  * Contract: `right` must be unique per (keys, ts) — dedup first
  * (e.g. keep max payload per instant) or the match among equal-ts
  * right rows is undefined, exactly as in DuckDB's ASOF JOIN.
  */
object AsofJoin {

  /** Left-outer as-of join. Result: left's columns, then right's
    * payload columns (null when no right row is at-or-before), then
    * `asof_ts` = the matched right timestamp. Column sets other than
    * (keys, ts) must be disjoint between the two sides. */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String): DataFrame =
    joinAsOfImpl(left, right, keys, ts, forward = false)

  /** FORWARD as-of: each left row matched with the FIRST right row at
    * or after it — "next event" enrichment (DuckDB `ASOF … ON
    * l.ts <= r.ts`). Same union+window shape, descending time order:
    * the running `last` then carries the smallest right ts ≥ left. */
  def joinAsOfForward(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String): DataFrame =
    joinAsOfImpl(left, right, keys, ts, forward = true)

  private def joinAsOfImpl(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], ts: String, forward: Boolean): DataFrame = {
    val common = keys :+ ts
    val leftPayload = left.columns.filterNot(common.contains).toSeq
    val rightPayload = right.columns.filterNot(common.contains).toSeq
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"as-of payload columns must be disjoint: ${leftPayload.intersect(rightPayload).mkString(",")}")
    val tsType = left.schema(ts).dataType

    val lTagged = left.select(
      common.map(col) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        Seq(lit(null).cast(tsType).as("asof_ts"), lit(1).as("__side")): _*)
    val rTagged = right.select(
      common.map(col) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col) ++
        Seq(col(ts).as("asof_ts"), lit(0).as("__side")): _*)

    val timeOrder = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (rightPayload :+ "asof_ts").foldLeft(lTagged.unionByName(rTagged)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .where(col("__side") === 1)
      .select(common.map(col) ++ leftPayload.map(col) ++
        rightPayload.map(col) :+ col("asof_ts"): _*)
  }
}
