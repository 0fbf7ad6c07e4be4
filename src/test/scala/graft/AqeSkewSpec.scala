package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling: the engine's STATIC answer to skew is the
  * salted join/agg pair (`q_skew_salted_join`/`_agg` — exact, planned
  * ahead); the RUNTIME answer on a real cluster is AQE's skew-join
  * split, which re-plans a sort-merge join mid-query when a shuffle
  * partition's actual bytes dwarf the median. This spec pins that
  * behavior as executable documentation: with the thresholds scaled
  * to test data, a 90%-hot-key join MUST come back `skew=true` (the
  * hot partition split into advisory-sized reads), produce exactly
  * the right rows, and revert to a plain join when the feature is
  * off — so the 100-TB story is "salt what you can predict, let AQE
  * catch what you can't", and both halves are tested. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.forceApply", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")

    // 90% of the left rides ONE key; the right is too big to broadcast
    // away the problem (threshold disabled), so the hot key lands in
    // one shuffle partition ~100x the median
    def skewedJoin() = {
      val left = s.range(0, 20000).select(
        when(col("id") < 18000, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val right = s.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
      left.join(right, "k")
    }

    // drive THIS frame's own query execution to completion — a
    // .count() would plan a separate query, and AQE only finalizes
    // the plan it actually ran
    val j = skewedJoin()
    assert(j.collect().length === 18000) // only k=0 matches; correctness first
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true") && plan.contains("skew=true"),
      s"expected a runtime skew-split sort-merge join, got:\n$plan")

    // control: same query, feature off — no skew marker, same rows
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val c = skewedJoin()
    assert(c.collect().length === 18000)
    assert(!c.queryExecution.executedPlan.toString.contains("skew=true"))
  }
}
