package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.ChartQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a
  * (name → query over an sf-dir) pair, with equivalent ANSI SQL for the
  * driver's DuckDB oracle. Column names and row order are aligned
  * between the two on purpose: the oracle hash-compares values after
  * sorting columns by name, and every query ends in a total-order sort
  * so float-free deterministic output is guaranteed on both engines.
  */
object SparkEntry {

  /** Flagship (SURVEY.md §7.5): LAG-gated day-over-day rank delta of the
    * daily top-10 entities per platform — the reference's
    * all_rankings_with_delta_view (W1+W2+O2) over the events fact. */
  def entry(spark: SparkSession): DataFrame =
    ChartQueries.q_rank_delta(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rank_delta" -> (ChartQueries.q_rank_delta _),
    "q_rank_delta_between" -> (ChartQueries.q_rank_delta_between _),
    "q_string_agg" -> (ChartQueries.q_string_agg _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_rank_delta" ->
      """WITH scores AS (
        |  SELECT CAST(ts AS DATE) AS date, event_type AS platform,
        |         user_id AS entity_id,
        |         SUM(CAST(value AS DECIMAL(14,2))) AS score
        |  FROM events GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT date, platform, entity_id,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY date, platform
        |           ORDER BY score DESC, entity_id ASC) AS INTEGER) AS rank
        |  FROM scores
        |), top AS (SELECT * FROM ranked WHERE rank <= 10)
        |SELECT date, platform, entity_id, rank,
        |       CASE WHEN LAG(date) OVER w = date - 1
        |            THEN LAG(rank) OVER w - rank END AS delta
        |FROM top
        |WINDOW w AS (PARTITION BY platform, entity_id ORDER BY date ASC)
        |ORDER BY date DESC, platform ASC, rank ASC""".stripMargin,
    "q_rank_delta_between" ->
      """WITH scores AS (
        |  SELECT CAST(ts AS DATE) AS date, event_type AS platform,
        |         user_id AS entity_id,
        |         SUM(CAST(value AS DECIMAL(14,2))) AS score
        |  FROM events GROUP BY 1, 2, 3
        |), ranked AS (
        |  SELECT date, platform, entity_id,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY date, platform
        |           ORDER BY score DESC, entity_id ASC) AS INTEGER) AS rank
        |  FROM scores WHERE TRUE
        |), top AS (SELECT * FROM ranked WHERE rank <= 10)
        |SELECT t1.platform AS platform, t1.entity_id AS entity_id,
        |       t1.rank - t2.rank AS delta
        |FROM top t1 JOIN top t2
        |  ON t1.platform = t2.platform AND t1.entity_id = t2.entity_id
        |WHERE t1.date = DATE '2024-01-10' AND t2.date = DATE '2024-01-11'
        |ORDER BY platform ASC, delta DESC, entity_id ASC""".stripMargin,
    "q_string_agg" ->
      """SELECT n_name AS nation,
        |       n_name || ' - ' || STRING_AGG(c_name, ', ' ORDER BY c_name)
        |         AS formatted,
        |       COUNT(*) AS n_members
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY nation ASC""".stripMargin,
  )
}
