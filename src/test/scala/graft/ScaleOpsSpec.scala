package graft

import org.apache.spark.sql.functions._

import graft.queries.ScaleQueries

/** Scale techniques: salted aggregation exactness and the sketch
  * trade-off (approx_count_distinct vs exact). */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum equals naive groupBy sum exactly") {
    val df = (1 to 1000).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val naive = df.groupBy("k").agg(sum(col("v").cast("decimal(14,2)")).as("total"))
      .orderBy("k").collect().map(r => r.getString(0) -> r.getDecimal(1)).toSeq
    val salted = ScaleQueries.saltedSum(df, Seq("k"), col("v").cast("decimal(14,2)"), 16)
      .orderBy("k").collect().map(r => r.getString(0) -> r.getDecimal(1)).toSeq
    assert(salted === naive)
  }

  test("approx_count_distinct tracks exact distinct within its error bound") {
    val events = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val both = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).head()
    val exact = both.getLong(0).toDouble
    val approx = both.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile tracks the exact interpolated percentile within rank accuracy") {
    val li = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
    val r = li.agg(
      org.apache.spark.sql.functions.percentile(col("l_quantity").cast("double"), lit(0.5)).as("exact"),
      approx_percentile(col("l_quantity").cast("double"), lit(0.5), lit(1000)).as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    // quantities are 1..50: at accuracy 1000 the sketch's rank error
    // keeps the estimate within one integer step of the exact median
    assert(math.abs(approx - exact) <= 1.0, s"approx=$approx exact=$exact")
  }

  test("salted join equals the plain join row-for-row") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val li = graft.io.Tables.table(spark, dir, "lineitem").withColumn("orderkey", col("l_orderkey"))
    val o = graft.io.Tables.table(spark, dir, "orders").withColumn("orderkey", col("o_orderkey"))
    val salted = graft.queries.ScaleQueries.saltedJoin(li, o, Seq("orderkey"), 8)
      .groupBy("orderkey").count().as[(Long, Long)].collect().toMap
    val plain = li.join(o, "orderkey")
      .groupBy("orderkey").count().as[(Long, Long)].collect().toMap
    assert(salted == plain && plain.nonEmpty)
  }
}
