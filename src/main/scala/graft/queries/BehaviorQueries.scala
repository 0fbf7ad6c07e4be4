package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Behavioral analytics over the `events` stream table: ordered
  * funnel conversion, weekly cohort retention, and an exponentially
  * weighted moving average — the product-analytics staples a
  * training-data platform still needs for its OWN telemetry (and the
  * query shapes — ordered multi-stage self-joins, first-touch
  * attribution, decayed time series — recur in curation pipelines as
  * "first crawl of a domain", "re-crawl cohort decay", "EWMA of
  * per-source quality").
  *
  * All three are exact and integer-anchored (epoch-micros deltas,
  * cent-quantized values, power-of-two decay weights) so the DuckDB
  * oracle hashes match bit-for-bit; see each query's scaladoc for the
  * 100 TB plan shape.
  */
object BehaviorQueries {

  private val FunnelStages = Seq("view", "click", "purchase")

  /** Ordered three-stage funnel (view → later click → later
    * purchase, per user): classic conversion analysis where stage
    * N+1 must happen strictly AFTER the user's first stage-N event.
    *
    * Plan shape: each stage is a filter + per-user min-aggregation +
    * equi-join on `user_id` — every step partial-aggregates before
    * its exchange and all three stages hash on the SAME key, so at
    * 100 TB the fact streams through one user-keyed shuffle per stage
    * with no broadcast of anything fact-sized and no window over the
    * raw events. Output is three rows: stage index/name, converted
    * users, and the summed stage-to-stage latency in micros (integer
    * — associative, hash-exact). */
  def q_funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    def stage(t: String) = e.filter(col("event_type") === t)

    val s1 = stage(FunnelStages(0)).groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t1"))
    val s2 = stage(FunnelStages(1)).join(s1, "user_id")
      .filter(unix_micros(col("ts")) > col("t1"))
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t2"), first(col("t1")).as("t1"))
    val s3 = stage(FunnelStages(2)).join(s2, "user_id")
      .filter(unix_micros(col("ts")) > col("t2"))
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("t3"), first(col("t2")).as("t2"))

    def row(i: Int, df: DataFrame, lag: Column): DataFrame =
      df.agg(
        count(lit(1)).as("n_users"),
        coalesce(sum(lag), lit(0L)).as("sum_lag_us"))
        .select(lit(i).as("stage"), lit(FunnelStages(i - 1)).as("stage_name"),
          col("n_users"), col("sum_lag_us"))

    row(1, s1, lit(0L))
      .unionByName(row(2, s2, col("t2") - col("t1")))
      .unionByName(row(3, s3, col("t3") - col("t2")))
      .orderBy(col("stage").asc)
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first-ever event; each later active week counts toward
    * (cohort_week, week_offset). The canonical retention matrix.
    *
    * Plan shape: first-touch is a per-user min-aggregation (partial
    * agg before the user-keyed exchange); activity is a per
    * (user, week) distinct — same key prefix, so the join back to
    * cohorts rides the user hash; the final matrix is a tiny
    * (weeks × offsets) aggregate. Nothing fact-sized is broadcast or
    * sorted; the only wide state is keyed by user_id. */
  def q_cohort_retention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
    val cohort = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val active = e.distinct()
    active.join(cohort, "user_id")
      .groupBy(
        col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week").asc, col("week_offset").asc)
  }

  private val EwmaDepth = 10

  /** Per-platform daily EWMA (α = 1/2) of cent-quantized event value,
    * over a bounded `EwmaDepth`-row frame. Decay weights are powers
    * of two, so the weighted sum and its normalizer are EXACT bigints
    * (hash-stable under any partitioning); the only float op is the
    * single final division, identical on both engines.
    *
    * Plan shape: the window runs over the (platform, date) DAILY
    * aggregate — bounded by the calendar (≤ a few thousand rows per
    * platform at ANY fact size), never the raw events, so the
    * low-cardinality partition key is safe at 100 TB: the fact table
    * contributes one partial-agg'd shuffle and the window input is
    * dimension-sized. The frame is a closed-form lag chain (one
    * Window pass, no self-join). */
  def q_ewma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .select(col("event_type").as("platform"), col("ts").cast("date").as("date"),
        round(col("value") * 100, 0).cast("bigint").as("c"))
      .groupBy("platform", "date")
      .agg(sum(col("c")).as("cents"))
    val w = Window.partitionBy("platform").orderBy(col("date").asc)
    val wsum = (0 until EwmaDepth)
      .map(d => coalesce(lag(col("cents"), d).over(w), lit(0L)) * lit(1L << (EwmaDepth - 1 - d)))
      .reduce(_ + _)
    val wnorm = (0 until EwmaDepth)
      .map(d => when(lag(col("cents"), d).over(w).isNotNull, lit(1L << (EwmaDepth - 1 - d))).otherwise(lit(0L)))
      .reduce(_ + _)
    daily
      .withColumn("wsum", wsum)
      .withColumn("wnorm", wnorm)
      .withColumn("ewma", round(col("wsum").cast("double") / col("wnorm") / 100.0, 6))
      .orderBy(col("platform").asc, col("date").asc)
  }

  // ---- registration -------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (q_funnel _),
    "q_cohort_retention" -> (q_cohort_retention _),
    "q_ewma" -> (q_ewma _))

  private val funnelSql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |           FROM events),
      |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view'
      |       GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(e.us) AS t2, MIN(s1.t1) AS t1
      |       FROM e JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.us > s1.t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(e.us) AS t3, MIN(s2.t2) AS t2
      |       FROM e JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.us > s2.t2 GROUP BY e.user_id)
      |SELECT 1 AS stage, 'view' AS stage_name, COUNT(*) AS n_users,
      |       CAST(0 AS BIGINT) AS sum_lag_us FROM s1
      |UNION ALL
      |SELECT 2, 'click', COUNT(*), CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM s2
      |UNION ALL
      |SELECT 3, 'purchase', COUNT(*), CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) FROM s3
      |ORDER BY stage ASC""".stripMargin

  private val cohortSql =
    """WITH e AS (SELECT DISTINCT user_id,
      |             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      |           FROM events),
      |c AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id)
      |SELECT c.cohort_week,
      |       CAST((e.week - c.cohort_week) // 7 AS INTEGER) AS week_offset,
      |       COUNT(*) AS n_users
      |FROM e JOIN c ON e.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY cohort_week ASC, week_offset ASC""".stripMargin

  private val ewmaSql = {
    val wsum = (0 until EwmaDepth)
      .map(d => s"COALESCE(LAG(cents, $d) OVER w, 0) * ${1L << (EwmaDepth - 1 - d)}")
      .mkString(" + ")
    val wnorm = (0 until EwmaDepth)
      .map(d => s"CASE WHEN LAG(cents, $d) OVER w IS NOT NULL THEN ${1L << (EwmaDepth - 1 - d)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type AS platform, CAST(ts AS DATE) AS date,
       |         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |w AS (SELECT platform, date, cents,
       |        $wsum AS wsum,
       |        CAST($wnorm AS BIGINT) AS wnorm
       |      FROM daily WINDOW w AS (PARTITION BY platform ORDER BY date ASC))
       |SELECT platform, date, cents, wsum, wnorm,
       |       ROUND(CAST(wsum AS DOUBLE) / wnorm / 100.0, 6) AS ewma
       |FROM w ORDER BY platform ASC, date ASC""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_funnel" -> funnelSql,
    "q_cohort_retention" -> cohortSql,
    "q_ewma" -> ewmaSql)
}
