package graft

import org.apache.spark.sql.functions._

import graft.functions.CmsExpr

/** Count-Min estimate expression: never underestimates (the property
  * the heavy-hitter prefilter depends on), stays close to exact
  * counts at the configured eps, and supports longs. */
class CmsExprSpec extends SparkSpec {
  import spark.implicits._

  test("estimates are >= true counts for every present value") {
    val rows = (1 to 50).flatMap(i => Seq.fill(i)(s"v$i")).toDF("k")
    val cms = CmsExpr.build(rows, "k", eps = 0.001, confidence = 0.99)
    val bad = rows.groupBy("k").agg(count(lit(1)).as("n"))
      .where(CmsExpr.estimate(cms, col("k")) < col("n")).count()
    assert(bad == 0, "CMS must never underestimate")
    // and the threshold filter keeps every true heavy hitter
    val kept = rows.where(CmsExpr.estimate(cms, col("k")) >= 30)
      .select("k").distinct().as[String].collect().toSet
    assert((30 to 50).map(i => s"v$i").toSet.subsetOf(kept))
  }

  test("long values estimate through the same sketch") {
    val rows = (1L to 100L).flatMap(i => Seq.fill(5)(i)).toDF("k")
    val cms = CmsExpr.build(rows, "k", eps = 0.001, confidence = 0.99)
    val est = Seq(7L).toDF("k")
      .select(CmsExpr.estimate(cms, col("k"))).as[Long].head()
    assert(est >= 5L && est < 50L, s"estimate $est")
  }
}
