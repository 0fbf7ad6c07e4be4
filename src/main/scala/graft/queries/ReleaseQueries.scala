package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Release-gate operators: differentially-private noisy counts,
  * day-of-week seasonality indices, a two-proportion A/B z-test,
  * CUSUM changepoint detection, and delete-one-group jackknife
  * standard errors — the statistical release layer between a data
  * platform's internal tables and anything published (privacy noise
  * before demographic slices go out, seasonal baselines before
  * "traffic is down" alarms, significance before a curation-policy
  * change ships, a located changepoint before "the mix shifted on
  * day X" claims, resampling error bars on any released mean).
  *
  * Deterministic throughout: the DP noise draws its uniform from the
  * engine-standard Knuth multiplicative hash (same constants as the
  * weighted sampler), so the "random" release replays exactly on
  * both engines; everything else is exact counts plus fixed double
  * chains (`ln` rounded to 6 per the engine idiom).
  */
object ReleaseQueries {

  private val MixA = 2654435761L
  private val MixB = 987654321L
  private val Mod = 4294967296L // 2^32

  /** ε=1 Laplace noisy counts per nation (sensitivity 1: each
    * customer contributes to exactly one cell). Inverse-CDF sampling
    * from a hash-seeded uniform: noise = −sgn(u−½)·ln(1−2|u−½|).
    * The true count is kept alongside for the audit gate (a real
    * release drops it — see [[StructureQueries.q_k_anon]] for the
    * suppression alternative).
    *
    * Plan: one partial-agg'd count over the fact, broadcast dim,
    * scalar noise math on the 25-row result. */
  def q_dp_counts(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.table(spark, dir, "customer")
      .join(broadcast(Tables.table(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n"))
    val ctr = (pmod(col("n_nationkey") * lit(MixA) + lit(MixB), lit(Mod))
      .cast("double") + lit(0.5)) / lit(Mod.toDouble) - lit(0.5)
    val noise = round(-signum(ctr) * log(lit(1.0) - lit(2.0) * abs(ctr)), 6)
    counts.select(col("nation"), col("n"), noise.as("noise"),
        (col("n") + noise).as("noisy_n"))
      .orderBy(col("nation").asc)
  }

  /** Day-of-week seasonality index per platform: mean daily event
    * count on each weekday relative to the platform's overall daily
    * mean — index = (Σ_dow / days_dow) / (Σ_all / days_all),
    * computed as one exact-integer cross-ratio so no mean is ever a
    * rounded intermediate.
    *
    * Plan: the fact aggregates once to (platform, date) — partial
    * agg before the one exchange — then twice more over the tiny
    * daily table; the overall row broadcasts back. */
  def q_seasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .groupBy(col("event_type").as("platform"), to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("n_ev"))
    val dow = daily
      .groupBy(col("platform"), weekday(col("date")).as("dow"))
      .agg(sum(col("n_ev")).as("s_dow"), count(lit(1)).as("days_dow"))
    val tot = daily.groupBy(col("platform"))
      .agg(sum(col("n_ev")).as("s_all"), count(lit(1)).as("days_all"))
    dow.join(broadcast(tot), "platform")
      .select(col("platform"), col("dow"), col("days_dow"),
        col("s_dow").as("n_events"),
        (col("s_dow").cast("double") * col("days_all")
          / (col("days_dow").cast("double") * col("s_all"))).as("seasonal_index"))
      .orderBy(col("platform").asc, col("dow").asc)
  }

  private val ConvValueMin = 150.0

  /** Two-proportion z-test on user conversion (a 'purchase' event of
    * value >= `ConvValueMin`), arms hash-split on user id — the pooled-variance
    * z-statistic gating every A/B readout. One row: per-arm user and
    * converter counts, rates, and z.
    *
    * Plan: two distinct-aggs on `user_id` (exchange on the user key,
    * partial agg first), a left join flag, then a single global
    * conditional count — the only single-partition stage reduces 4
    * integers, not data. */
  def q_abtest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "events")
    val users = e.select(col("user_id")).distinct()
      .withColumn("arm", pmod(col("user_id"), lit(2)))
    val conv = e.where(col("event_type") === "purchase"
        && col("value") >= ConvValueMin)
      .select(col("user_id")).distinct().withColumn("is_conv", lit(1))
    val flagged = users.join(conv, Seq("user_id"), "left")
    val s = flagged.agg(
      count(when(col("arm") === 0, lit(1))).as("n0"),
      count(when(col("arm") === 0 && col("is_conv").isNotNull, lit(1))).as("c0"),
      count(when(col("arm") === 1, lit(1))).as("n1"),
      count(when(col("arm") === 1 && col("is_conv").isNotNull, lit(1))).as("c1"))
    val r0 = col("c0").cast("double") / col("n0")
    val r1 = col("c1").cast("double") / col("n1")
    val p = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    s.select(col("n0"), col("c0"), col("n1"), col("c1"),
      r0.as("rate0"), r1.as("rate1"),
      ((r1 - r0) / sqrt(p * (lit(1.0) - p)
        * (lit(1.0) / col("n0").cast("double")
          + lit(1.0) / col("n1").cast("double")))).as("z"))
  }

  /** CUSUM changepoint per platform: the day where the cumulative
    * sum of deviations from the platform's mean daily event count
    * peaks in magnitude — the classic Page (1954) location estimate
    * for a single level shift. Deviations are kept INTEGER by scaling:
    * dev_t = n_t·D − N (D days, N total events), so the cusum is
    * D·(prefix count) − t·N — exact on both engines, no fractional
    * mean ever materializes.
    *
    * Plan: the fact aggregates once to (platform, day) with partial
    * aggregation before the exchange; both windows (running sum,
    * top-1 pick) run over that tiny daily table partitioned by
    * platform — bounded by days×platforms rows, never the fact. */
  def q_changepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(spark, dir, "events")
      .groupBy(col("event_type").as("platform"), to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("n_ev"))
    val tot = daily.groupBy(col("platform"))
      .agg(sum(col("n_ev")).as("n_total"), count(lit(1)).as("n_days"))
    val dev = daily.join(broadcast(tot), "platform")
      .withColumn("dev", col("n_ev") * col("n_days") - col("n_total"))
    val run = Window.partitionBy(col("platform")).orderBy(col("date").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = dev.withColumn("cusum", sum(col("dev")).over(run))
    val pick = Window.partitionBy(col("platform"))
      .orderBy(abs(col("cusum")).desc, col("date").asc)
    cusum.withColumn("rn", row_number().over(pick))
      .where(col("rn") === 1)
      .select(col("platform"), col("date").as("change_date"),
        col("cusum"), col("n_days"), col("n_total"))
      .orderBy(col("platform").asc)
  }

  private val JkScale = 1000000L

  /** Delete-one-group (cluster) jackknife (Tukey 1958; Efron 1982)
    * on the mean order price, clusters = customer nations: the
    * released mean plus the standard error a reviewer asks for, with
    * the resampling respecting that orders within a nation correlate.
    * Leave-one-out means are single divisions of EXACT integer sums
    * (cents), quantized to 1e-6 cents before the cross-group moment
    * sums (taken in decimal — associative, order-invariant), so the
    * only double steps are per-row division and one final scalar
    * chain, both engine-identical.
    *
    * Plan: one fact-fact equi-join (orders ⋈ customer on custkey),
    * partial-agg'd down to 25 nation rows before anything global;
    * the moment pass reduces 25 rows to one. */
  def q_jackknife(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s_c"),
        count(lit(1)).as("n"))
    val tot = per.agg(sum(col("s_c")).as("s_all"), sum(col("n")).as("n_all"),
      count(lit(1)).as("g"))
    // θ̂_(i) in cents, scaled by 1e6 and rounded → exact BIGINT
    val t = per.crossJoin(broadcast(tot))
      .withColumn("t", round((col("s_all") - col("s_c")).cast("double")
        * lit(JkScale.toDouble) / (col("n_all") - col("n")).cast("double"))
        .cast("long"))
    val m = t.groupBy(col("s_all"), col("n_all"), col("g"))
      .agg(sum(col("t")).as("st"),
        sum(col("t").cast("decimal(38,0)") * col("t")).as("st2"))
    val gD = col("g").cast("double")
    val varT = (col("st2").cast("double")
      - col("st").cast("double") * col("st") / gD) * (gD - lit(1.0)) / gD
    m.select(col("g"), col("n_all").as("n_orders"),
      round(col("s_all").cast("double") / col("n_all") / lit(100.0), 6)
        .as("mean_price"),
      round(sqrt(varT) / lit(1.0e8), 6).as("jk_se"))
  }

  // ---- registration -------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dp_counts" -> (q_dp_counts _),
    "q_seasonality" -> (q_seasonality _),
    "q_abtest" -> (q_abtest _),
    "q_changepoint" -> (q_changepoint _),
    "q_jackknife" -> (q_jackknife _))

  private val dpCountsSql =
    s"""WITH c AS (SELECT n_nationkey, n_name AS nation, COUNT(*) AS n
       |           FROM customer JOIN nation ON c_nationkey = n_nationkey
       |           GROUP BY 1, 2),
       |u AS (SELECT nation, n,
       |        (CAST((n_nationkey * $MixA + $MixB) % $Mod AS DOUBLE) + 0.5)
       |          / CAST($Mod AS DOUBLE) - 0.5 AS ctr
       |      FROM c)
       |SELECT nation, n,
       |       round(-sign(ctr) * ln(1 - 2 * abs(ctr)), 6) AS noise,
       |       n + round(-sign(ctr) * ln(1 - 2 * abs(ctr)), 6) AS noisy_n
       |FROM u ORDER BY nation ASC""".stripMargin

  private val seasonalitySql =
    """WITH daily AS (SELECT event_type AS platform, CAST(ts AS DATE) AS date,
      |                 COUNT(*) AS n_ev
      |               FROM events GROUP BY 1, 2),
      |d AS (SELECT platform, CAST(isodow(date) - 1 AS INTEGER) AS dow,
      |        CAST(SUM(n_ev) AS BIGINT) AS s_dow, COUNT(*) AS days_dow
      |      FROM daily GROUP BY 1, 2),
      |t AS (SELECT platform, CAST(SUM(n_ev) AS BIGINT) AS s_all,
      |        COUNT(*) AS days_all
      |      FROM daily GROUP BY 1)
      |SELECT d.platform, dow, days_dow, s_dow AS n_events,
      |       CAST(s_dow AS DOUBLE) * days_all
      |         / (CAST(days_dow AS DOUBLE) * s_all) AS seasonal_index
      |FROM d JOIN t ON d.platform = t.platform
      |ORDER BY d.platform ASC, dow ASC""".stripMargin

  private val abtestSql =
    """WITH users AS (SELECT DISTINCT user_id FROM events),
      |a AS (SELECT user_id, user_id % 2 AS arm FROM users),
      |conv AS (SELECT DISTINCT user_id FROM events
      |         WHERE event_type = 'purchase' AND value >= 150.0),
      |f AS (SELECT a.arm, conv.user_id AS cu
      |      FROM a LEFT JOIN conv ON a.user_id = conv.user_id),
      |s AS (SELECT
      |        COUNT(CASE WHEN arm = 0 THEN 1 END) AS n0,
      |        COUNT(CASE WHEN arm = 0 AND cu IS NOT NULL THEN 1 END) AS c0,
      |        COUNT(CASE WHEN arm = 1 THEN 1 END) AS n1,
      |        COUNT(CASE WHEN arm = 1 AND cu IS NOT NULL THEN 1 END) AS c1
      |      FROM f)
      |SELECT n0, c0, n1, c1,
      |       CAST(c0 AS DOUBLE) / n0 AS rate0,
      |       CAST(c1 AS DOUBLE) / n1 AS rate1,
      |       (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
      |         / sqrt(CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
      |             * (CAST(1 AS DOUBLE) - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
      |             * (CAST(1 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |               + CAST(1 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS z
      |FROM s""".stripMargin

  private val changepointSql =
    """WITH daily AS (SELECT event_type AS platform, CAST(ts AS DATE) AS date,
      |                 COUNT(*) AS n_ev
      |               FROM events GROUP BY 1, 2),
      |t AS (SELECT platform, CAST(SUM(n_ev) AS BIGINT) AS n_total,
      |        COUNT(*) AS n_days
      |      FROM daily GROUP BY 1),
      |c AS (SELECT daily.platform, date, n_days, n_total,
      |        SUM(n_ev * n_days - n_total) OVER (
      |          PARTITION BY daily.platform ORDER BY date ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      |      FROM daily JOIN t ON daily.platform = t.platform),
      |r AS (SELECT *, ROW_NUMBER() OVER (
      |        PARTITION BY platform ORDER BY abs(cusum) DESC, date ASC) AS rn
      |      FROM c)
      |SELECT platform, date AS change_date, CAST(cusum AS BIGINT) AS cusum,
      |       n_days, n_total
      |FROM r WHERE rn = 1 ORDER BY platform ASC""".stripMargin

  private val jackknifeSql =
    s"""WITH per AS (SELECT c_nationkey,
       |        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s_c,
       |        COUNT(*) AS n
       |      FROM orders JOIN customer ON o_custkey = c_custkey
       |      GROUP BY 1),
       |tot AS (SELECT CAST(SUM(s_c) AS BIGINT) AS s_all,
       |          CAST(SUM(n) AS BIGINT) AS n_all, COUNT(*) AS g
       |        FROM per),
       |t AS (SELECT s_all, n_all, g,
       |        CAST(round(CAST(s_all - s_c AS DOUBLE) * $JkScale.0
       |          / CAST(n_all - n AS DOUBLE)) AS BIGINT) AS t
       |      FROM per CROSS JOIN tot),
       |m AS (SELECT s_all, n_all, g, CAST(SUM(t) AS BIGINT) AS st,
       |        SUM(CAST(t AS HUGEINT) * t) AS st2
       |      FROM t GROUP BY 1, 2, 3)
       |SELECT g, n_all AS n_orders,
       |       round(CAST(s_all AS DOUBLE) / n_all / 100.0, 6) AS mean_price,
       |       /* the VARCHAR round-trip on st2 is LOAD-BEARING, do not
       |          simplify to a direct cast: DuckDB's HUGEINT->DOUBLE is
       |          upper*2^64+lower (two roundings, can land 1 ulp off),
       |          while Spark casts decimal(38,0) via
       |          BigDecimal.doubleValue (correctly rounded — same as
       |          parsing the decimal string), and st2 - st^2/g cancels
       |          catastrophically, so 1 ulp here moves the 6-dp jk_se */
       |       round(sqrt((CAST(CAST(st2 AS VARCHAR) AS DOUBLE)
       |           - CAST(st AS DOUBLE) * st / CAST(g AS DOUBLE))
       |         * (CAST(g AS DOUBLE) - 1.0) / CAST(g AS DOUBLE)) / 1e8, 6)
       |         AS jk_se
       |FROM m""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dp_counts" -> dpCountsSql,
    "q_seasonality" -> seasonalitySql,
    "q_abtest" -> abtestSql,
    "q_changepoint" -> changepointSql,
    "q_jackknife" -> jackknifeSql)
}
