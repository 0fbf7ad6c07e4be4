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
}
