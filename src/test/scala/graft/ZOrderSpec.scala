package graft

import org.apache.spark.sql.functions._

import graft.io.ZOrder

/** Z-order layout: per-file min/max spans must shrink on BOTH
  * clustered dimensions vs a linear sort, which is exactly what makes
  * parquet stats prune files for filters on either column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Mean per-file (max-min) span of `c`, normalized by the global
    * span — 1.0 means every file covers the whole range (no skipping
    * possible), small means tight files. */
  private def meanSpan(path: String, c: String): Double = {
    val df = spark.read.parquet(path)
    val g = df.agg((max(col(c)) - min(col(c))).cast("double")).head().getDouble(0)
    df.groupBy(input_file_name())
      .agg(((max(col(c)) - min(col(c))) / g).cast("double").as("s"))
      .agg(avg("s")).head().getDouble(0)
  }

  test("z-order tightens per-file bounds on both dimensions vs linear sort") {
    val events = graft.io.Tables.table(spark, "/root/testdata/sf0.01", "events")
      .withColumn("day", datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
      .select("event_id", "user_id", "day", "value")
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val linear = s"$base/linear"
    val zed = s"$base/zorder"
    val nFiles = 16
    // linear: sorted by day only (the layout a time-series append gives)
    events.repartitionByRange(nFiles, col("day"))
      .sortWithinPartitions(col("day"))
      .write.mode("overwrite").parquet(linear)
    ZOrder.writeZOrdered(events, "user_id", "day", nFiles, zed)

    // same data either way
    assert(spark.read.parquet(zed).count() == events.count())

    val linUser = meanSpan(linear, "user_id")
    val zUser = meanSpan(zed, "user_id")
    val zDay = meanSpan(zed, "day")
    // linear-by-day files cover ~the whole user range; z-ordered files
    // must be substantially tighter on user_id while still bounding day
    assert(linUser > 0.8, s"test premise broken: linear user span $linUser")
    assert(zUser < linUser / 2, s"z-order user span $zUser vs linear $linUser")
    assert(zDay < 0.8, s"z-order day span $zDay should stay bounded")
  }
}
