package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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

  /** Register every testdata table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
