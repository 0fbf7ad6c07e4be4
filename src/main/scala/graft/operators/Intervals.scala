package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands interval merging: collapse overlapping (or
  * touching) [start, end) intervals per key into maximal islands —
  * the canonical form of "merge user activity windows", coverage
  * spans, validity-range consolidation.
  *
  * Mechanics: within each key, an interval starts a NEW island iff
  * its start lies strictly past the running maximum end of all
  * earlier intervals (running max, not `lag(end)` — an earlier long
  * interval can swallow several later short ones); the island id is
  * the running count of such starts, then one aggregation per island.
  *
  * Scale: one window pass + one aggregation, both partitioned by the
  * key — no self-joins (the naive `NOT EXISTS overlapping` form is
  * quadratic per key). Works on any ordered type with `>` (numbers,
  * timestamps).
  */
object Intervals {

  def mergeOverlapping(
      df: DataFrame, keys: Seq[String],
      start: String, end: String): DataFrame = {
    val keyCols = keys.map(col)
    val order = Seq(col(start).asc, col(end).asc)
    val w = Window.partitionBy(keyCols: _*).orderBy(order: _*)
    val prevMaxEnd = max(col(end))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(
      prevMaxEnd.isNull || col(start) > prevMaxEnd, lit(1)).otherwise(lit(0))
    df
      .withColumn("__new_island", newIsland)
      .withColumn("__island",
        sum(col("__new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keyCols :+ col("__island"): _*)
      .agg(
        min(col(start)).as("island_start"),
        max(col(end)).as("island_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
