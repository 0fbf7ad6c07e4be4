package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session —
  * Spark session startup dominates test time otherwise). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  import scala.jdk.CollectionConverters._

  def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))

  def assertSameRows(got: DataFrame, expected: Seq[Seq[Any]]): Unit = {
    val g = rowsOf(got)
    assert(g == expected, s"\ngot:      $g\nexpected: $expected")
  }

  /** Count REAL shuffle nodes in an executed tree, unwrapping the AQE
    * wrappers (a cached relation's internal exchange is reprinted in
    * the plan STRING under every InMemoryTableScan, but is not in the
    * executed tree this walks). */
  def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self + kids.map(countShuffles).sum
  }

  /** Run `f` with auto-broadcast disabled, so only an explicit
    * broadcast() hint can put a BroadcastExchange in a plan. */
  def withoutAutoBroadcast[T](f: => T): T = {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      f
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
