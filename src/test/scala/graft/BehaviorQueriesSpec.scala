package graft

import org.apache.spark.sql.functions._

import graft.queries.BehaviorQueries

/** Invariants for the behavioral-analytics family (funnel, cohort
  * retention, EWMA) beyond the DuckDB oracle hash: the structural
  * properties that must hold at ANY data scale. */
class BehaviorQueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("funnel stages are monotonically non-increasing and lagged stages have positive latency") {
    val rows = BehaviorQueries.q_funnel(spark, dir).collect()
    assert(rows.length == 3)
    val users = rows.map(_.getAs[Long]("n_users"))
    assert(users(0) >= users(1) && users(1) >= users(2), users.toSeq)
    // stage 1 has no predecessor: zero latency by definition
    assert(rows(0).getAs[Long]("sum_lag_us") == 0L)
    // converted stages accumulated strictly-later timestamps
    rows.drop(1).filter(_.getAs[Long]("n_users") > 0)
      .foreach(r => assert(r.getAs[Long]("sum_lag_us") > 0L, r))
  }

  test("cohort retention: offset 0 counts every cohort member; later offsets never exceed it") {
    val df = BehaviorQueries.q_cohort_retention(spark, dir)
    val byCohort = df.collect().groupBy(_.getAs[java.sql.Date]("cohort_week"))
    byCohort.foreach { case (week, rows) =>
      val base = rows.find(_.getAs[Int]("week_offset") == 0)
      // every user is active in their own first week
      assert(base.isDefined, s"cohort $week missing offset 0")
      val n0 = base.get.getAs[Long]("n_users")
      rows.foreach(r => assert(r.getAs[Long]("n_users") <= n0, r))
    }
    // cohort sizes sum to the distinct-user total
    val totalUsers = graft.io.Tables.table(spark, dir, "events")
      .select("user_id").distinct().count()
    val offset0Sum = df.filter(col("week_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    assert(offset0Sum == totalUsers)
  }

  test("ewma: full frames normalize by 2^10 - 1, first frame degenerates to the daily value") {
    val rows = BehaviorQueries.q_ewma(spark, dir).collect()
    val byPlatform = rows.groupBy(_.getAs[String]("platform"))
    byPlatform.values.foreach { prows =>
      val sorted = prows.sortBy(_.getAs[java.sql.Date]("date").getTime)
      // row 1: only the current day is in frame → ewma == cents/100
      val head = sorted.head
      assert(head.getAs[Long]("wnorm") == 512L)
      assert(math.abs(head.getAs[Double]("ewma") - head.getAs[Long]("cents") / 100.0 / 512.0 * 512.0) < 1e-6)
      // rows ≥ 10: complete geometric frame
      sorted.drop(9).foreach(r => assert(r.getAs[Long]("wnorm") == 1023L, r))
      // ewma is a convex combination → bounded by the frame's min/max daily value
      sorted.zipWithIndex.foreach { case (r, i) =>
        val frame = sorted.slice(math.max(0, i - 9), i + 1).map(_.getAs[Long]("cents") / 100.0)
        assert(r.getAs[Double]("ewma") >= frame.min - 1e-6 && r.getAs[Double]("ewma") <= frame.max + 1e-6, r)
      }
    }
  }
}
