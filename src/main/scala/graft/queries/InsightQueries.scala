package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.AssocRules

/** Statistical insight operators: association-rule mining, group-wise
  * OLS regression, categorical mutual information, and a next-event
  * Markov transition matrix — the "what correlates with what"
  * analytics layer a data platform runs over its own corpus and
  * telemetry (source co-occurrence, quality-vs-time drift, metadata
  * dependence, session dynamics).
  *
  * All four are exact-count-anchored: every aggregate is an integer
  * (or an exact decimal) sum, and the only floating-point steps are
  * scalar +-*-/ chains on those exact values (IEEE-deterministic,
  * identical in Spark and DuckDB) plus `ln` rounded to 6 decimals
  * (the established idiom absorbing the ≤1-ulp libm difference).
  */
object InsightQueries {

  private[graft] val AssocMinSup = 3L
  private[graft] val AssocTopK = 100

  /** Association rules over order baskets: frequent pairs from the
    * staged co-occurrence artifact ([[GraphStage.copurchasePairCounts]]
    * — built once per snapshot, shared with the graph queries), then
    * [[AssocRules.rules]] confidence/lift scoring, top-100 by lift.
    *
    * Equivalence to the prune-first [[AssocRules.frequentPairs]] path
    * (which remains the standalone operator and is spec-asserted
    * against this query): ps ≤ min(sup_a, sup_b), so every pair with
    * ps ≥ minSup already has both items frequent — filtering the
    * unpruned pair counts yields the identical pair set, and the item
    * supports re-attach via two broadcast joins on the (post-filter,
    * tiny) pair table. Plan shape: one pass over the staged artifact
    * + one item-support aggregation of the incidence; top-k is
    * TakeOrderedAndProject. */
  def q_assoc_rules(spark: SparkSession, dir: String): DataFrame = {
    val li = GraphStage.basketItems(spark, dir)
      .select(col("o").as("basket"), col("p").as("item"))
    val nBaskets = li.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemSup = li.groupBy("item").agg(count(lit(1)).as("sup"))
    val pairs = GraphStage.copurchasePairCounts(spark, dir)
      .where(col("n_co") >= AssocMinSup)
      .join(broadcast(itemSup.select(col("item").as("u"), col("sup").as("sup_a"))), "u")
      .join(broadcast(itemSup.select(col("item").as("v"), col("sup").as("sup_b"))), "v")
      .select(col("u").as("ia"), col("v").as("ib"),
        col("sup_a"), col("sup_b"), col("n_co").as("ps"))
    AssocRules.rules(pairs, nBaskets, AssocTopK)
  }

  /** Per-nation OLS regression of order value (cents) on order date
    * (epoch days): slope, intercept, and r² from the closed-form
    * normal equations — drift detection ("is this source's spend /
    * quality trending?") as one exact aggregation.
    *
    * Moment sums (Σx, Σy, Σx², Σxy, Σy²) accumulate in
    * DECIMAL(38,0) — matching the oracle's HUGEINT — so the central
    * moments n·Σxy − ΣxΣy etc. are EXACT integers; each statistic is
    * then a fixed chain of double ops on those exact values,
    * bit-identical on both engines. (The oracle casts HUGEINT→DOUBLE
    * through VARCHAR: DuckDB's direct hugeint cast is not correctly
    * rounded past 2⁵³, while its string parse and Spark's
    * BigDecimal.doubleValue both are.) Bound: |n·Σxy| stays inside 38
    * digits up to ~10¹² rows of 10⁵-cent orders — beyond the 100 TB
    * frame. One partial-agg'd scan of the fact; dims broadcast; the
    * 25-row result never shuffles again. */
  def q_regression(spark: SparkSession, dir: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val o = Tables.table(spark, dir, "orders").select(
      col("o_custkey"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
        .cast("long").as("x"),
      round(col("o_totalprice") * 100, 0).cast("long").as("y"))
    val j = o
      .join(Tables.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.table(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("x"), col("y"))
    val s = j.groupBy("nation").agg(
      count(lit(1)).as("n"),
      sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x") * col("x"))).as("sxx"),
      sum(dec(col("x") * col("y"))).as("sxy"),
      sum(dec(col("y") * col("y"))).as("syy"))
    val m = s.select(col("nation"), col("n"), col("sx"), col("sy"),
      (col("n") * col("sxy") - col("sx") * col("sy")).as("mxy"),
      (col("n") * col("sxx") - col("sx") * col("sx")).as("mxx"),
      (col("n") * col("syy") - col("sy") * col("sy")).as("myy"))
    m.where(col("mxx") =!= 0 && col("myy") =!= 0)
      .select(col("nation"), col("n"),
        (col("mxy").cast("double") / col("mxx").cast("double"))
          .as("slope_cents_per_day"),
        ((col("sy").cast("double")
          - col("mxy").cast("double") / col("mxx").cast("double")
            * col("sx").cast("double")) / col("n")).as("intercept_cents"),
        (col("mxy").cast("double") * col("mxy").cast("double")
          / (col("mxx").cast("double") * col("myy").cast("double"))).as("r2"))
      .orderBy(col("nation").asc)
  }

  /** Mutual information between market segment and order priority:
    * the joint (segment, priority) distribution with per-cell PMI
    * and MI contribution — the dependence audit run before treating
    * two metadata columns as independent stratification keys.
    *
    * The fact is touched once (join + one grouped count); marginals
    * and the total are re-aggregations of the |X|·|Y|-cell joint
    * table (25 rows), broadcast back. PMI = ln(n_xy·n/(n_x·n_y))
    * on exact counts, rounded to 6. */
  def q_mutual_info(spark: SparkSession, dir: String): DataFrame = {
    val j = Tables.table(spark, dir, "orders").select(col("o_custkey"), col("o_orderpriority"))
      .join(Tables.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"))
    val xy = j.groupBy("segment", "priority").agg(count(lit(1)).as("n_xy"))
    val mx = xy.groupBy("segment").agg(sum(col("n_xy")).as("n_x"))
    val my = xy.groupBy("priority").agg(sum(col("n_xy")).as("n_y"))
    val tot = xy.agg(sum(col("n_xy")).as("n"))
    xy.join(broadcast(mx), "segment")
      .join(broadcast(my), "priority")
      .crossJoin(broadcast(tot))
      .withColumn("pmi", round(log(
        col("n_xy").cast("double") * col("n")
          / (col("n_x").cast("double") * col("n_y"))), 6))
      .select(col("segment"), col("priority"), col("n_xy"), col("pmi"),
        round(col("n_xy").cast("double") / col("n") * col("pmi"), 9)
          .as("mi_contrib"))
      .orderBy(col("segment").asc, col("priority").asc)
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next event type | current event type) — session
    * dynamics (and the generic "what follows what" over any keyed,
    * ordered log).
    *
    * The lead window partitions on `user_id` (high cardinality —
    * parallel at any scale); transition counts partial-agg on the
    * (from, to) composite; row totals are a re-aggregation of the
    * |types|² transition table, broadcast back. Probabilities are
    * one exact-count division. */
  def q_markov(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
    val nxt = e.withColumn("next_type",
      lead(col("event_type"), 1).over(
        Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)))
    val trans = nxt.where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    trans.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("n_from")).as("prob"))
      .orderBy(col("from_type").asc, col("to_type").asc)
  }

  // ---- registration -------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_assoc_rules" -> (q_assoc_rules _),
    "q_regression" -> (q_regression _),
    "q_mutual_info" -> (q_mutual_info _),
    "q_markov" -> (q_markov _))

  private val assocRulesSql =
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
       |            FROM lineitem),
       |nb AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM li),
       |sup AS (SELECT item, COUNT(*) AS sup FROM li GROUP BY item),
       |p0 AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS ps
       |       FROM li a JOIN li b ON a.basket = b.basket AND a.item < b.item
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $AssocMinSup),
       |p AS (SELECT ia, ib, ps, sa.sup AS sup_a, sb.sup AS sup_b
       |      FROM p0 JOIN sup sa ON p0.ia = sa.item
       |      JOIN sup sb ON p0.ib = sb.item),
       |r AS (SELECT ia AS antecedent, ib AS consequent, ps AS support,
       |        sup_a AS sup_ante, sup_b AS sup_cons FROM p
       |      UNION ALL
       |      SELECT ib, ia, ps, sup_b, sup_a FROM p)
       |SELECT antecedent, consequent, support,
       |       CAST(support AS DOUBLE) / sup_ante AS confidence,
       |       CAST(support AS DOUBLE) / sup_ante
       |         * (SELECT n_baskets FROM nb) / sup_cons AS lift
       |FROM r
       |ORDER BY lift DESC, antecedent ASC, consequent ASC
       |LIMIT $AssocTopK""".stripMargin

  private val regressionSql =
    """WITH o AS (SELECT o_custkey,
      |             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y
      |           FROM orders),
      |j AS (SELECT n_name AS nation, x, y
      |      FROM o JOIN customer ON o_custkey = c_custkey
      |      JOIN nation ON c_nationkey = n_nationkey),
      |s AS (SELECT nation, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |        SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
      |      FROM j GROUP BY nation),
      |m AS (SELECT nation, n,
      |        CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
      |        CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
      |        CAST(CAST(n*sxy - sx*sy AS VARCHAR) AS DOUBLE) AS mxy,
      |        CAST(CAST(n*sxx - sx*sx AS VARCHAR) AS DOUBLE) AS mxx,
      |        CAST(CAST(n*syy - sy*sy AS VARCHAR) AS DOUBLE) AS myy,
      |        n*sxx - sx*sx AS mxx_i, n*syy - sy*sy AS myy_i
      |      FROM s)
      |SELECT nation, n,
      |       mxy / mxx AS slope_cents_per_day,
      |       (syd - mxy / mxx * sxd) / n AS intercept_cents,
      |       mxy * mxy / (mxx * myy) AS r2
      |FROM m WHERE mxx_i <> 0 AND myy_i <> 0
      |ORDER BY nation ASC""".stripMargin

  private val mutualInfoSql =
    """WITH j AS (SELECT c_mktsegment AS segment, o_orderpriority AS priority
      |           FROM orders JOIN customer ON o_custkey = c_custkey),
      |xy AS (SELECT segment, priority, COUNT(*) AS n_xy FROM j GROUP BY 1, 2),
      |mx AS (SELECT segment, SUM(n_xy) AS n_x FROM xy GROUP BY 1),
      |my AS (SELECT priority, SUM(n_xy) AS n_y FROM xy GROUP BY 1),
      |t AS (SELECT SUM(n_xy) AS n FROM xy),
      |q AS (SELECT xy.segment, xy.priority, n_xy,
      |        round(ln(CAST(n_xy AS DOUBLE) * n
      |                 / (CAST(n_x AS DOUBLE) * n_y)), 6) AS pmi,
      |        CAST(n_xy AS DOUBLE) / n AS p_xy
      |      FROM xy JOIN mx ON xy.segment = mx.segment
      |      JOIN my ON xy.priority = my.priority
      |      CROSS JOIN t)
      |SELECT segment, priority, n_xy, pmi, round(p_xy * pmi, 9) AS mi_contrib
      |FROM q ORDER BY segment ASC, priority ASC""".stripMargin

  private val markovSql =
    """WITH e AS (SELECT user_id, event_type,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      |           FROM events),
      |nxt AS (SELECT event_type,
      |          LEAD(event_type, 1) OVER (PARTITION BY user_id
      |            ORDER BY us ASC, event_id ASC) AS next_type
      |        FROM e),
      |trans AS (SELECT event_type AS from_type, next_type AS to_type,
      |            COUNT(*) AS n
      |          FROM nxt WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, SUM(n) AS n_from FROM trans GROUP BY 1)
      |SELECT trans.from_type, to_type, n, CAST(n AS DOUBLE) / n_from AS prob
      |FROM trans JOIN tot ON trans.from_type = tot.from_type
      |ORDER BY trans.from_type ASC, to_type ASC""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_assoc_rules" -> assocRulesSql,
    "q_regression" -> regressionSql,
    "q_mutual_info" -> mutualInfoSql,
    "q_markov" -> markovSql)
}
