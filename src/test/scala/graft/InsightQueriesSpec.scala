package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.AssocRules
import graft.queries.InsightQueries

/** Invariants for the insight family (association rules, OLS
  * regression, mutual information, Markov transitions) beyond the
  * oracle hash. */
class InsightQueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("assoc rules: downward closure — pruned mining equals unpruned mining") {
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    val minSup = 2L
    val pruned = AssocRules.frequentPairs(li, minSup)
      .select("ia", "ib", "ps").collect().toSet
    // unpruned: same per-basket self-join over ALL items
    val unpruned = li.as("a").join(li.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("ps"))
      .filter(col("ps") >= minSup)
      .collect().toSet
    assert(pruned == unpruned)
    assert(pruned.nonEmpty)
  }

  test("assoc rules: staged-artifact mining equals the prune-first operator path") {
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
      .distinct()
    val nBaskets = li.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val direct = AssocRules.rules(
        AssocRules.frequentPairs(li, InsightQueries.AssocMinSup),
        nBaskets, InsightQueries.AssocTopK)
      .collect().map(_.toSeq).toSeq
    val staged = InsightQueries.q_assoc_rules(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(staged == direct && staged.nonEmpty)
  }

  test("assoc rules: confidence in (0,1], support bounded by item supports, lift consistent both directions") {
    val rows = InsightQueries.q_assoc_rules(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0.0 && conf <= 1.0, r)
      assert(r.getAs[Double]("lift") > 0.0, r)
    }
    // lift is symmetric: both directions of a pair report the same lift
    val byPair = rows.groupBy { r =>
      val a = r.getAs[Long]("antecedent"); val b = r.getAs[Long]("consequent")
      (math.min(a, b), math.max(a, b))
    }
    byPair.values.filter(_.size == 2).foreach { pair =>
      assert(math.abs(pair(0).getAs[Double]("lift") - pair(1).getAs[Double]("lift")) < 1e-12)
    }
  }

  test("regression: slope/intercept match a driver-side exact OLS on the same rows") {
    val got = InsightQueries.q_regression(spark, dir).collect()
      .map(r => r.getAs[String]("nation") ->
        (r.getAs[Double]("slope_cents_per_day"), r.getAs[Double]("intercept_cents"),
          r.getAs[Double]("r2"))).toMap
    val rows = Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.table(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("x"),
        round(col("o_totalprice") * 100, 0).cast("long").as("y"))
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (nation, rs) =>
      val n = rs.length
      val xs = rs.map(_.getAs[Long]("x")); val ys = rs.map(_.getAs[Long]("y"))
      val sx = BigInt(xs.sum); val sy = BigInt(ys.sum)
      val sxx = xs.map(x => BigInt(x) * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
      val mxy = (BigInt(n) * sxy - sx * sy).toDouble
      val mxx = (BigInt(n) * sxx - sx * sx).toDouble
      val slope = mxy / mxx
      val (gs, gi, gr2) = got(nation)
      assert(math.abs(gs - slope) < 1e-9, s"$nation slope $gs vs $slope")
      assert(math.abs(gi - ((sy.toDouble - slope * sx.toDouble) / n)) < 1e-6)
      assert(gr2 >= 0.0 && gr2 <= 1.0)
    }
  }

  test("mutual info: marginal-sum identity and PMI sign structure") {
    val rows = InsightQueries.q_mutual_info(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_xy")).sum
    // cells tile the joined fact exactly
    val factN = Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(total == factN)
    // MI total (sum of contributions) is non-negative up to rounding slack
    val mi = rows.map(_.getAs[Double]("mi_contrib")).sum
    assert(mi > -1e-6, s"MI must be >= 0, got $mi")
  }

  test("markov: probabilities sum to 1 per from-state, counts tile the transitions") {
    val rows = InsightQueries.q_markov(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (from, rs) =>
      val p = rs.map(_.getAs[Double]("prob")).sum
      assert(math.abs(p - 1.0) < 1e-9, s"$from sums to $p")
    }
    // total transitions = events - users-with-at-least-one-event
    val e = Tables.table(spark, dir, "events")
    val expected = e.count() - e.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }
}
