package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** The reference's analytics surface (SURVEY.md §2.4, §2.5, §2.11)
  * re-expressed Spark-first over the driver's synthetic testdata.
  *
  * The reference's fact table is `ranking_tb(isrc, ranking_date, rank,
  * ranking_source)`; the testdata analog is `events(ts, user_id,
  * event_type, value)` with `user_id ≈ isrc` (entity), `event_type ≈
  * ranking_source` (platform), `date(ts) ≈ ranking_date`.
  *
  * Determinism rules used throughout (SURVEY.md §7.4 risk 3/4):
  *  - exact arithmetic for anything aggregated (decimal casts, never
  *    raw double sums — engine-dependent summation order would break
  *    the DuckDB hash oracle and, at scale, run-to-run reproducibility);
  *  - every ranking window carries a total order (value, then key);
  *  - every query output ends in a total-order sort.
  */
object ChartQueries {

  /** Exact daily per-entity score: sum(value) as decimal (2-dp input).
    *
    * Partitioned by (date, platform) up front: HashPartitioning on a
    * SUBSET of the groupBy keys satisfies the aggregation's clustered
    * distribution AND the downstream ranking window's requirement, so
    * the agg and the top-k window share ONE exchange instead of
    * re-shuffling between them (verified in PLANS.md). Partial
    * aggregation still combines map-side before the exchange. */
  private def dailyScores(events: DataFrame): DataFrame =
    events
      .select(
        to_date(col("ts")).as("date"),
        col("event_type").as("platform"),
        col("user_id").as("entity_id"),
        col("value").cast("decimal(14,2)").as("v"))
      .repartition(col("date"), col("platform"))
      .groupBy("date", "platform", "entity_id")
      .agg(sum("v").as("score"))

  /** W2 positional ranking: top-10 entities per (date, platform) by
    * score. `row_number` over a TOTAL order (score desc, entity asc) —
    * never list position (Spark has no row order), SURVEY.md §2.5 W2.
    *
    * Scale: one shuffle on (date, platform); the window within a
    * partition is tiny (entities per day*platform), no skew concern.
    */
  def rankings(events: DataFrame, k: Int = 10): DataFrame = {
    val byScore = Window
      .partitionBy("date", "platform")
      .orderBy(col("score").desc, col("entity_id").asc)
    dailyScores(events)
      .withColumn("rank", row_number().over(byScore))
      .where(col("rank") <= k)
      .select("date", "platform", "entity_id", "rank")
  }

  /** W1 flagship: LAG-based day-over-day rank delta with the
    * consecutive-day gate (gap ⇒ NULL ⇒ "new"), mirroring
    * reference `db/sql/create_schema_behavior.sql:128-156`.
    *
    * delta = lag(rank) - rank, but ONLY when the previous ranked day
    * for this (platform, entity) is exactly yesterday.
    */
  def rankingsWithDelta(events: DataFrame, k: Int = 10): DataFrame = {
    val series = Window
      .partitionBy("platform", "entity_id")
      .orderBy(col("date").asc)
    rankings(events, k)
      .withColumn(
        "delta",
        when(
          lag(col("date"), 1).over(series) === date_sub(col("date"), 1),
          lag(col("rank"), 1).over(series) - col("rank")))
      .orderBy(col("date").desc, col("platform").asc, col("rank").asc)
  }

  /** X2 rank-delta UDTF analog: delta between two fixed dates via an
    * equi self-join on (platform, entity), reference
    * `create_schema_behavior.sql:36-54` (SURVEY.md §2.3 J2).
    *
    * Pushdown makes this two pruned scans + a small hash join; at
    * scale with a date-partitioned fact both sides prune to one
    * partition each.
    */
  def rankDeltaBetween(events: DataFrame, baseline: String, comparison: String, k: Int = 10): DataFrame = {
    val r = rankings(events, k)
    val t1 = r.where(col("date") === lit(baseline)).as("t1")
    val t2 = r.where(col("date") === lit(comparison)).as("t2")
    t1.join(t2, Seq("platform", "entity_id"))
      .select(
        col("platform"),
        col("entity_id"),
        (col("t1.rank") - col("t2.rank")).as("delta"))
      .orderBy(col("platform").asc, col("delta").desc, col("entity_id").asc)
  }

  /** A1 ordered string-agg (STRING_AGG(name, ', ' ORDER BY name)):
    * customers per nation, reference `create_schema_behavior.sql:20-25`.
    * Decomposed as array_join ∘ array_sort ∘ collect_list — exact
    * semantics because the sort key IS the aggregated value
    * (SURVEY.md §2.4 A1). F1 string concat on top.
    *
    * Scale: partial aggregation (collect_list combines map-side); the
    * per-group list is bounded by group cardinality — for unbounded
    * groups switch to a sketch or top-N truncation.
    */
  def orderedStringAgg(customer: DataFrame, nation: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        array_join(array_sort(collect_list(col("c_name"))), ", ").as("members"),
        count(lit(1)).as("n_members"))
      .select(
        col("nation"),
        concat_ws(" - ", col("nation"), col("members")).as("formatted"),
        col("n_members"))
      .orderBy(col("nation").asc)

  // ---- wiring helpers -----------------------------------------------

  def q_rank_delta(spark: SparkSession, dir: String): DataFrame =
    rankingsWithDelta(Tables.table(spark, dir, "events"))

  def q_rank_delta_between(spark: SparkSession, dir: String): DataFrame =
    rankDeltaBetween(Tables.table(spark, dir, "events"), "2024-01-10", "2024-01-11")

  def q_string_agg(spark: SparkSession, dir: String): DataFrame =
    orderedStringAgg(
      Tables.table(spark, dir, "customer"),
      Tables.table(spark, dir, "nation"))
}
