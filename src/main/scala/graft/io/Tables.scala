package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Readers for the driver-generated synthetic testdata (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Explicit-by-construction:
  * parquet carries the schema; we never infer CSV/JSON schemas anywhere
  * in this engine (mirrors the reference's fixed DDL stance,
  * reference `db/sql/create_schema_structure.sql:19-70`).
  *
  * Scale notes (100 TB design): at cluster scale these would be
  * partitioned-by-date facts (`orders`, `lineitem`, `events`) and
  * broadcast-able dims (`region`, `nation`, `customer`, `supplier`,
  * `part`). All downstream operators in [[graft.queries]] are written so
  * the date filters and column prunes reach the scan (verified via
  * `.explain` — see PLANS.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every query path flows through here: install the engine's
    // planner strategy + top-k rewrite on sessions built without
    // GraftExtensions (the driver's Verify/Bench sessions)
    graft.plans.TopK.install(spark)
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read it as a long and truncate to micros EXACTLY
      // (integer division — a double roundtrip would lose precision at
      // ~1.7e18 ns). DuckDB truncates nanos→micros the same way, so the
      // oracle compare sees identical instants.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events with a time-range predicate pushed to the parquet scan:
    * the converted `ts` is a derived column (nanos→micros), so range
    * filters on it can NOT push down — filtering the RAW nanos long
    * first gives the scan a pushable `[from, until)` range, then the
    * conversion runs on the survivors only. At scale this is the
    * difference between reading a day and reading the table. */
  def eventsBetween(spark: SparkSession, sfDir: String, fromIso: String, untilIso: String): DataFrame = {
    val fromNs = java.time.Instant.parse(fromIso).getEpochSecond * 1000000000L
    val untilNs = java.time.Instant.parse(untilIso).getEpochSecond * 1000000000L
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("ts") >= fromNs && col("ts") < untilNs)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every testdata table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
