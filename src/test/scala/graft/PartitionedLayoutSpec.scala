package graft

import org.apache.spark.sql.functions._

/** The 100 TB fact layout the scaladoc assumes, made concrete:
  * date-partitioned parquet gives (1) partition-pruned scans for
  * point/range date predicates and (2) retention as a partition
  * drop, no rewrite of surviving data. */
class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val root = "/tmp/graft_partitioned/events"

  test("date-partitioned facts: scans prune partitions; retention is a directory drop") {
    val events = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("date", to_date(col("ts")))
    events.write.mode("overwrite").partitionBy("date").parquet(root)

    val read = spark.read.parquet(root)
    val oneDay = read.where(col("date") === "2024-01-15")
    oneDay.collect()
    val scan = oneDay.queryExecution.executedPlan.toString()
    // the date predicate must prune at planning time, not filter rows
    assert(scan.contains("PartitionFilters: [isnotnull(date"), scan)
    val totalDays = read.select("date").distinct().count()
    val prunedFiles = oneDay.select(input_file_name()).distinct().count()
    val allFiles = read.select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles, s"pruned=$prunedFiles all=$allFiles")

    // retention = drop partitions older than the cutoff — surviving
    // partitions untouched (same files), no data rewrite
    val cutoff = java.sql.Date.valueOf("2024-01-10")
    val dropped = read.select("date").distinct()
      .where(col("date") < lit(cutoff)).as[java.sql.Date].collect()
    dropped.foreach { d =>
      val dir = new java.io.File(s"$root/date=$d")
      assert(dir.isDirectory)
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    val after = spark.read.parquet(root)
    assert(after.select("date").distinct().count() == totalDays - dropped.length)
    assert(after.where(col("date") < lit(cutoff)).isEmpty)
    // surviving day's rows identical to the source
    val survivors = after.where(col("date") === "2024-01-15").count()
    assert(survivors == events.where(col("date") === "2024-01-15").count() && survivors > 0)
  }
}
