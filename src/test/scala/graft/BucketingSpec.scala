package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join layout for 100 TB fact⋈fact joins.
  * Both sides written bucketed+sorted on the join key ⇒ the join
  * plans with ZERO exchanges (and zero sorts, thanks to sortBy) —
  * the shuffle happens once at write time and every subsequent join
  * reuses it. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val warehouse = "/tmp/graft_bucketed"

  test("bucketed+sorted tables join with no exchange and no sort in the plan") {
    val orders = graft.io.Tables.table(spark, dir, "orders")
    val customer = graft.io.Tables.table(spark, dir, "customer")
    // repartition on the bucket key first: writer hash == bucket hash,
    // so each task owns exactly one bucket → ONE file per bucket →
    // Spark trusts the written sort order (multiple files per bucket
    // would force a re-sort at read)
    orders.repartition(8, col("o_custkey")).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$warehouse/orders").format("parquet")
      .saveAsTable("graft_orders_bucketed")
    customer.repartition(8, col("c_custkey")).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$warehouse/customer").format("parquet")
      .saveAsTable("graft_customer_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    // since 3.0 Spark only propagates the per-bucket sort into the
    // scan's outputOrdering under this flag (one file per bucket is
    // still required — hence the aligned repartition above)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val got = joined.orderBy("c_mktsegment")
        .as[(String, Long)].collect().toSeq
      val plan = joined.queryExecution.executedPlan.toString()
      // the join itself consumes bucket layout: no shuffle, no sort
      // (the single exchange in the plan belongs to the groupBy)
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange"), s"join should be co-located:\n$plan")
      assert(!joinSection.contains("Sort "), s"bucket sort order should be reused:\n$plan")
      // same answer as the unbucketed join
      val want = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").as[(String, Long)].collect().toSeq
      assert(got == want && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_customer_bucketed")
    }
  }
}
