package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.ReleaseQueries

/** Invariants for the release family (DP noisy counts, seasonality,
  * A/B z-test) beyond the oracle hash. */
class ReleaseQueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("dp counts: noise is deterministic, Laplace-scaled, and never exactly cancels") {
    val a = ReleaseQueries.q_dp_counts(spark, dir).collect()
    val b = ReleaseQueries.q_dp_counts(spark, dir).collect()
    assert(a.toSeq == b.toSeq) // hash-seeded, replayable
    val noises = a.map(_.getAs[Double]("noise"))
    assert(noises.forall(n => !n.isNaN && !n.isInfinite))
    // Laplace(b=1): median |noise| = ln 2; the 25 draws should land
    // in a generous band around that scale
    val meanAbs = noises.map(math.abs).sum / noises.length
    assert(meanAbs > 0.1 && meanAbs < 10.0, s"mean |noise| $meanAbs")
    a.foreach { r =>
      assert(r.getAs[Double]("noisy_n") == r.getAs[Long]("n") + r.getAs[Double]("noise"))
    }
  }

  test("seasonality: day-of-week indices reconstruct the overall mean") {
    val rows = ReleaseQueries.q_seasonality(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6))
    // Σ index·days_dow = days_all per platform (index is a mean ratio)
    rows.groupBy(_.getAs[String]("platform")).foreach { case (p, rs) =>
      val daysAll = rs.map(_.getAs[Long]("days_dow")).sum
      val s = rs.map(r => r.getAs[Double]("seasonal_index") * r.getAs[Long]("days_dow")).sum
      assert(math.abs(s / daysAll - 1.0) < 1e-9, s"$p: $s vs $daysAll")
    }
  }

  test("changepoint: peak cusum matches a driver-side scan and the full cusum closes at zero") {
    val got = ReleaseQueries.q_changepoint(spark, dir).collect()
      .map(r => (r.getAs[String]("platform"), r.getAs[java.sql.Date]("change_date").toString,
        r.getAs[Long]("cusum"))).toSeq

    val daily = Tables.table(spark, dir, "events")
      .groupBy(col("event_type").as("platform"), to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("platform"), r.getAs[java.sql.Date]("date").toString,
        r.getAs[Long]("n")))
    val expected = daily.groupBy(_._1).toSeq.sortBy(_._1).map { case (p, rows) =>
      val byDay = rows.sortBy(_._2)
      val total = byDay.map(_._3).sum
      val d = byDay.length.toLong
      val cusums = byDay.scanLeft(0L) { case (acc, (_, _, n)) => acc + n * d - total }.tail
      // last cusum must close at zero: Σ(n·D − N) = D·N − D·N
      assert(cusums.last == 0L, s"$p cusum tail ${cusums.last}")
      val (day, cu) = byDay.map(_._2).zip(cusums)
        .minBy { case (dy, c) => (-math.abs(c), dy) }
      (p, day, cu)
    }
    assert(got == expected)
  }

  test("jackknife: se and mean match a driver-side leave-one-nation-out replay") {
    val r = ReleaseQueries.q_jackknife(spark, dir).collect().head
    val per = Tables.table(spark, dir, "orders")
      .join(Tables.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(x => (x.getAs[Long]("s"), x.getAs[Long]("n")))
    val (sAll, nAll) = (per.map(_._1).sum, per.map(_._2).sum)
    val g = per.length
    val t = per.map { case (s, n) =>
      math.round((sAll - s).toDouble * 1e6 / (nAll - n).toDouble) }
    val st = t.sum.toDouble
    val st2 = t.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val varT = (st2 - st * st / g) * (g - 1.0) / g
    assert(r.getAs[Long]("g") == g && r.getAs[Long]("n_orders") == nAll)
    assert(math.abs(r.getAs[Double]("mean_price")
      - sAll.toDouble / nAll / 100.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("jk_se") - math.sqrt(varT) / 1e8) < 1e-6)
    assert(r.getAs[Double]("jk_se") > 0.0)
  }

  test("abtest: arms tile the user base and z matches a driver-side recomputation") {
    val r = ReleaseQueries.q_abtest(spark, dir).collect().head
    val (n0, c0, n1, c1) = (r.getAs[Long]("n0"), r.getAs[Long]("c0"),
      r.getAs[Long]("n1"), r.getAs[Long]("c1"))
    val users = Tables.table(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    assert(n0 + n1 == users)
    assert(c0 <= n0 && c1 <= n1)
    val (r0, r1) = (c0.toDouble / n0, c1.toDouble / n1)
    val p = (c0 + c1).toDouble / (n0 + n1)
    val z = (r1 - r0) / math.sqrt(p * (1.0 - p) * (1.0 / n0 + 1.0 / n1))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
    assert(r.getAs[Double]("rate0") == r0 && r.getAs[Double]("rate1") == r1)
  }
}
