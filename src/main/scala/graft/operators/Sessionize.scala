package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts whenever the time
  * since the key's previous event exceeds `gap` — the classic
  * clickstream/attribution operator.
  *
  * Shape: one shuffle on the key (the session window), everything
  * else map-side. `session_seq` is a running sum of new-session
  * flags, so it is stable per (key, ts, tieBreak) regardless of
  * physical row order — `tieBreak` makes the within-key order total
  * when timestamps collide (required for a deterministic LAG).
  *
  * At scale this is the streaming-native operation
  * ([[graft.streaming.StreamingCharts]] holds the watermarked
  * variants); the batch form here is what backfills history.
  */
object Sessionize {

  /** Adds `session_seq` (1-based, per key, in time order). `gap` is
    * microseconds between consecutive events. */
  def sessionize(events: DataFrame, key: String, ts: String, tieBreak: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, col(tieBreak).asc)
    val gap: Column = unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w)
    events
      .withColumn("__new_session",
        when(gap.isNull || gap > gapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .drop("__new_session")
  }

  /** Per-session rollup: event count, bounds, and exact duration. */
  def sessionStats(events: DataFrame, key: String, ts: String, tieBreak: String, gapUs: Long): DataFrame =
    sessionize(events, key, ts, tieBreak, gapUs)
      .groupBy(col(key), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        // floor, not cast: Spark's double→long cast truncates while
        // DuckDB's rounds — floor division agrees in both engines
        floor((max(unix_micros(col(ts))) - min(unix_micros(col(ts)))) / lit(1000000L))
          .cast("long").as("duration_sec"))
}
