package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Scale-technique operators: the shapes that keep a 100 TB job alive
  * — skew-salted aggregation, exact distinct, multi-join star
  * rollups with broadcast dims. Results are exactly equal to the
  * naive plans (the oracle SQL IS the naive plan), only the physical
  * shuffle layout differs.
  */
object ScaleQueries {

  /** Two-phase skew-salted aggregation: phase 1 aggregates
    * (key, salt) — splitting each hot key across `salts` reducers —
    * phase 2 merges the partials per key. Exact for any commutative
    * merge (decimal sum here). The manual form of what AQE's skew
    * handling does for joins, applied to aggregation. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, salts: Int): DataFrame = {
    val keyCols = keys.map(col)
    df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as("total"))
  }

  /** Skewed aggregation demo: lineitem has only 3 returnflag groups —
    * maximal key skew. The salted plan spreads each group over 16
    * partial reducers; the merged totals are decimal-exact and equal
    * to the naive GROUP BY (the oracle). */
  def q_skew_salted_agg(spark: SparkSession, dir: String): DataFrame =
    saltedSum(
      Tables.table(spark, dir, "lineitem"),
      Seq("l_returnflag"),
      col("l_quantity").cast("decimal(14,2)"),
      salts = 16)
      // exact decimal two-level sum, DOUBLE at the output boundary
      // (decimal outputs don't survive the oracle's float64 coercion
      // when values carry trailing zeros — qty sums always end .00)
      .select(col("l_returnflag"), col("total").cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc)

  /** Exact distinct counting per group (the shuffle-heavy exact form;
    * approx_count_distinct is the sketch alternative, compared in
    * ScaleOpsSpec since sketches can't hash-match an oracle). */
  def q_distinct_users(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .groupBy(col("event_type").as("platform"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("platform").asc)

  /** Star-schema revenue rollup (TPC-H Q5 shape): fact ⋈ fact ⋈ dim ⋈
    * dim ⋈ dim with every dim broadcast — the fact tables stream
    * through broadcast hash joins and shuffle only for the final
    * small aggregation. */
  def q_revenue_per_nation(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.table(spark, dir, "lineitem")
    val o = Tables.table(spark, dir, "orders")
    val c = Tables.table(spark, dir, "customer")
    val n = Tables.table(spark, dir, "nation")
    val r = Tables.table(spark, dir, "region")
    val price = col("l_extendedprice").cast("decimal(14,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        sum(price * (lit(1) - disc)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("region").asc, col("nation").asc)
  }

  /** TPC-H Q5 shape — the canonical join-order stress: a six-table
    * star with a cross-dimension equality (customer and supplier must
    * share a nation — a join predicate BETWEEN two dimension paths,
    * not just fact→dim), a selective region filter, and a pushed-down
    * order-date range. Catalyst's reorder + broadcast dims carry the
    * plan: the fact⋈fact join shuffles once, every dimension
    * broadcasts, and the date range prunes the orders scan before the
    * join (asserted in PlanPropertiesSpec). Revenue follows the
    * house decimal discipline (exact decimal sum, double at the
    * output boundary) so the DESC sort key is engine-deterministic. */
  def q_local_supplier_volume(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.table(spark, dir, "lineitem")
    val o = Tables.table(spark, dir, "orders")
    val c = Tables.table(spark, dir, "customer")
    val s = Tables.table(spark, dir, "supplier")
    val n = Tables.table(spark, dir, "nation")
    val r = Tables.table(spark, dir, "region")
    val price = col("l_extendedprice").cast("decimal(14,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    l.join(o.where(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy(col("n_name").as("nation"))
      .agg(
        sum(price * (lit(1) - disc)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("nation").asc)
  }

  /** Mergeable HLL-sketch distinct counting via
    * [[graft.operators.HllSketch]] — the pre-aggregated "sketch
    * table" pattern (Druid datasketches, Trino `approx_set`/`merge`,
    * BigQuery `HLL_COUNT.*`): per-(day, platform) 256-bucket partials
    * built map-side in one events scan, rolled up to platform level
    * by the bucket-wise-max sketch union. At 100 TB the daily sketch
    * table (≤256 rows per group per day) is the persisted artifact
    * and rollups never rescan the fact; exact countDistinct is
    * joined as the accuracy baseline (the expensive scan the sketch
    * exists to avoid — labeled, like the n² ANN baselines). The
    * md5-derived bucket/ρ and the exact-integer divisor (see the
    * operator's scaladoc) are what let DuckDB replay the sketch
    * bit-identically for the hash gate. */
  def q_hll_rollup(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.HllSketch
    val ev = Tables.table(spark, dir, "events")
    val daily = HllSketch.sketch( // the persisted daily sketch table
      ev.select(
        col("event_type").as("platform"),
        to_date(col("ts")).as("day"),
        col("user_id")),
      col("user_id"), Seq("platform", "day"))
    val merged = HllSketch.merge(daily, Seq("platform"))
    val exact = ev
      .groupBy(col("event_type").as("platform"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    HllSketch.estimate(merged, Seq("platform"))
      .withColumn("est_users", round(col("est"), 6))
      .join(broadcast(exact), "platform")
      .select(
        col("platform"), col("n_present"), col("est_users"),
        col("exact_users"),
        round(abs(col("est_users") - col("exact_users").cast("double")) /
          col("exact_users").cast("double") * lit(100.0), 4).as("err_pct"))
      .orderBy(col("platform").asc)
  }

  /** §2.7 completeness beyond the reference: INTERSECT / EXCEPT
    * proper (customers active in both/only-one event window). */
  def q_set_ops(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "events").withColumn("date", to_date(col("ts")))
    val week1 = e.where(col("date") <= lit("2024-01-07")).select("user_id").distinct()
    val week4 = e.where(col("date") >= lit("2024-01-24")).select("user_id").distinct()
    week1.intersect(week4).withColumn("set_op", lit("both"))
      .unionByName(week1.except(week4).withColumn("set_op", lit("only_early")))
      .orderBy(col("set_op").asc, col("user_id").asc)
  }

  /** Pivot (wide matrix): daily event counts, one column per
    * platform — the conditional-aggregation form every BI layer
    * needs; platforms enumerated explicitly so the plan is one pass. */
  def q_pivot(spark: SparkSession, dir: String): DataFrame = {
    val platforms = Seq("click", "error", "purchase", "signup", "view")
    Tables.table(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("date"))
      .pivot("event_type", platforms)
      .agg(count(lit(1)))
      .na.fill(0L, platforms)
      .orderBy(col("date").asc)
  }

  /** Unpivot (melt): the wide daily-counts matrix back to long
    * (date, platform, n_events) rows via `stack` — the inverse of
    * [[q_pivot]] and the standard wide→long reshape for feature
    * tables. Zero cells are KEPT: the melt is dense, which is what
    * distinguishes it from re-aggregating the fact (a gap day shows
    * as an explicit 0 row). One generator expression per input row —
    * map-only over the pivoted table, no extra exchange. */
  def q_unpivot(spark: SparkSession, dir: String): DataFrame = {
    val platforms = Seq("click", "error", "purchase", "signup", "view")
    val cells = platforms.map(p => s"'$p', $p").mkString(", ")
    q_pivot(spark, dir)
      .select(col("date"),
        expr(s"stack(${platforms.size}, $cells) AS (platform, n_events)"))
      .orderBy(col("date").asc, col("platform").asc)
  }

  /** Skew-salted JOIN: the big side gets a synthetic salt, the small
    * side is replicated once per salt value, and the join key becomes
    * (key, salt) — each hot key spreads over `salts` reducers. The
    * result is EXACTLY the plain join (each big row meets exactly its
    * salt's replica); only the shuffle layout differs. The manual
    * form of AQE's skew-join splitting, for when stats miss the skew. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Salted-join demo: lineitem ⋈ orders spread over 8 salts, then a
    * small rollup; hash-matches the plain-join oracle. */
  def q_skew_salted_join(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(
      Tables.table(spark, dir, "lineitem").withColumn("orderkey", col("l_orderkey")),
      Tables.table(spark, dir, "orders").withColumn("orderkey", col("o_orderkey")),
      Seq("orderkey"), salts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(14,2)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority").asc)

  /** Data-quality audit: the reference's CHECK/FK constraints as a
    * batch validation pass — one (check, n_violations) row per rule,
    * anti-joins for referential ones. The shape every ingest gate
    * needs before promoting a batch. */
  def q_validate(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
    val lineitem = Tables.table(spark, dir, "lineitem")
    val customer = Tables.table(spark, dir, "customer")
    val events = Tables.table(spark, dir, "events")
    val checks: Seq[(String, DataFrame)] = Seq(
      "events_null_user" -> events.where(col("user_id").isNull),
      "lineitem_orphan_order" ->
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti"),
      "lineitem_qty_range" ->
        lineitem.where(col("l_quantity") < 1 || col("l_quantity") > 50),
      "orders_nonneg_price" -> orders.where(col("o_totalprice") < 0),
      "orders_orphan_customer" ->
        orders.join(customer, col("o_custkey") === col("c_custkey"), "left_anti"),
    )
    checks
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_violations")).withColumn("check", lit(name))
      }
      .reduce(_ unionByName _)
      .select("check", "n_violations")
      .orderBy(col("check").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted_join" -> (q_skew_salted_join _),
    "q_validate" -> (q_validate _),
    "q_skew_salted_agg" -> (q_skew_salted_agg _),
    "q_distinct_users" -> (q_distinct_users _),
    "q_revenue_per_nation" -> (q_revenue_per_nation _),
    "q_local_supplier_volume" -> (q_local_supplier_volume _),
    "q_hll_rollup" -> (q_hll_rollup _),
    "q_set_ops" -> (q_set_ops _),
    "q_pivot" -> (q_pivot _),
    "q_unpivot" -> (q_unpivot _),
  )

  val oracles: Map[String, String] = Map(
    "q_skew_salted_join" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)))
        |       AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority ASC""".stripMargin,
    "q_validate" ->
      """SELECT * FROM (
        |  SELECT 'events_null_user' AS check, COUNT(*) AS n_violations
        |  FROM events WHERE user_id IS NULL
        |  UNION ALL
        |  SELECT 'lineitem_orphan_order', COUNT(*) FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |  UNION ALL
        |  SELECT 'lineitem_qty_range', COUNT(*) FROM lineitem
        |  WHERE l_quantity < 1 OR l_quantity > 50
        |  UNION ALL
        |  SELECT 'orders_nonneg_price', COUNT(*) FROM orders
        |  WHERE o_totalprice < 0
        |  UNION ALL
        |  SELECT 'orders_orphan_customer', COUNT(*) FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |ORDER BY "check" ASC""".stripMargin,
    "q_skew_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(14,2)))
        |       AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC""".stripMargin,
    "q_distinct_users" ->
      """SELECT event_type AS platform, COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY platform ASC""".stripMargin,
    "q_set_ops" ->
      """WITH w1 AS (SELECT DISTINCT user_id FROM events
        |            WHERE CAST(ts AS DATE) <= DATE '2024-01-07'),
        |     w4 AS (SELECT DISTINCT user_id FROM events
        |            WHERE CAST(ts AS DATE) >= DATE '2024-01-24')
        |SELECT * FROM (
        |  SELECT user_id, 'both' AS set_op FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w4)
        |  UNION ALL
        |  SELECT user_id, 'only_early' FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w4))
        |ORDER BY set_op ASC, user_id ASC""".stripMargin,
    "q_pivot" ->
      """SELECT CAST(ts AS DATE) AS date,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY date ASC""".stripMargin,
    "q_unpivot" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS date, event_type AS platform,
        |             COUNT(*) AS n FROM events GROUP BY 1, 2),
        |dates AS (SELECT DISTINCT date FROM d),
        |p AS (SELECT unnest(['click','error','purchase','signup','view'])
        |        AS platform)
        |SELECT dates.date, p.platform,
        |       COALESCE(n, 0) AS n_events
        |FROM dates CROSS JOIN p
        |LEFT JOIN d ON d.date = dates.date AND d.platform = p.platform
        |ORDER BY dates.date ASC, p.platform ASC""".stripMargin,
    "q_revenue_per_nation" ->
      """SELECT r_name AS region, n_name AS nation,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |      * (1 - CAST(l_discount AS DECIMAL(4,2))))
        |       AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY region ASC, nation ASC""".stripMargin,
    "q_local_supplier_volume" ->
      """SELECT n_name AS nation,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
        |      * (1 - CAST(l_discount AS DECIMAL(4,2))))
        |       AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, nation ASC""".stripMargin,
    "q_hll_rollup" ->
      """WITH h AS (
        |  SELECT event_type AS platform,
        |         md5('hll:' || CAST(user_id AS VARCHAR)) AS h
        |  FROM events),
        |p AS (SELECT platform, substr(h, 1, 2) AS bucket,
        |             substr(h, 3, 13) AS rest FROM h),
        |r AS (SELECT platform, bucket,
        |        4 * length(regexp_extract(rest, '^0*')) +
        |        CASE WHEN length(regexp_extract(rest, '^0*')) = 13 THEN 0
        |             ELSE CASE
        |               WHEN substr(rest, length(regexp_extract(rest, '^0*')) + 1, 1) < '2' THEN 3
        |               WHEN substr(rest, length(regexp_extract(rest, '^0*')) + 1, 1) < '4' THEN 2
        |               WHEN substr(rest, length(regexp_extract(rest, '^0*')) + 1, 1) < '8' THEN 1
        |               ELSE 0 END END + 1 AS rho
        |      FROM p),
        |sk AS (SELECT platform, bucket, max(rho) AS m
        |       FROM r GROUP BY platform, bucket),
        |ag AS (SELECT platform,
        |         CAST(SUM(1::BIGINT << (53 - m)) AS BIGINT) AS s_present,
        |         COUNT(*) AS n_present
        |       FROM sk GROUP BY platform),
        |e1 AS (SELECT platform, n_present,
        |         s_present + (256 - n_present) * (1::BIGINT << 53) AS sumint,
        |         256 - n_present AS zb
        |       FROM ag),
        |e2 AS (SELECT platform, n_present, zb,
        |         (CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 256))
        |           * 65536 * 9007199254740992 / CAST(sumint AS DOUBLE) AS raw
        |       FROM e1),
        |e3 AS (SELECT platform, n_present,
        |         round(CASE WHEN raw <= 640 AND zb > 0
        |           THEN 256.0 * ln(CAST(256 AS DOUBLE) / CAST(zb AS DOUBLE))
        |           ELSE raw END, 6) AS est_users
        |       FROM e2),
        |ex AS (SELECT event_type AS platform,
        |              COUNT(DISTINCT user_id) AS exact_users
        |       FROM events GROUP BY event_type)
        |SELECT platform, n_present, est_users, exact_users,
        |       round(abs(est_users - CAST(exact_users AS DOUBLE))
        |             / CAST(exact_users AS DOUBLE) * 100.0, 4) AS err_pct
        |FROM e3 JOIN ex USING (platform)
        |ORDER BY platform ASC""".stripMargin,
  )
}
