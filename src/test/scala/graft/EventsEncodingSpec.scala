package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.Tables

/** The events reader must survive BOTH parquet encodings the testdata
  * generator has shipped for `events.ts` across rounds:
  *
  *  - TIMESTAMP(NANOS), which Spark 4 only reads as a bare long under
  *    `spark.sql.legacy.parquet.nanosAsLong` (modeled here by a plain
  *    int64 `ts` column — identical from the reader's point of view);
  *  - native TIMESTAMP(MICROS)/NTZ (what `timestamp[us]` pandas
  *    parquet produces).
  *
  * Round 5 died because the reader hardwired the first encoding; this
  * spec pins the schema dispatch so a future regeneration can't
  * silently break either path again. Both encodings must produce the
  * SAME TimestampType rows, and `eventsBetween` must push its range
  * to the parquet scan in BOTH modes (raw-nanos longs vs native
  * timestamp literals) — at 100 TB the pushdown is the difference
  * between reading a day and reading the table. */
class EventsEncodingSpec extends SparkSpec {

  private val base = Files.createTempDirectory("graft-events-enc").toString
  private val nanosDir = s"$base/nanos"
  private val microsDir = s"$base/micros"

  private def writeFixtures(): Unit = {
    import spark.implicits._
    val instants = Seq(
      "2024-03-01T00:00:00Z", "2024-03-01T12:30:00Z",
      "2024-03-02T00:00:00Z", "2024-03-03T06:00:00Z")
    val rows = instants.zipWithIndex.map { case (iso, i) =>
      (i.toLong, java.time.Instant.parse(iso), i.toLong % 2,
        s"type_$i", i * 1.5, "{}")
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // nanos-as-long encoding: the instant as an epoch-nanos int64
    df.withColumn("ts", unix_micros(col("ts")) * 1000)
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    // native encoding: TIMESTAMP_NTZ micros, like the pandas testdata
    df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")
  }
  writeFixtures()

  private def tsRows(df: DataFrame): Seq[(Long, String)] =
    df.select(col("event_id"), col("ts").cast("string"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)

  test("Tables.table dispatches on the observed schema: both encodings yield identical TimestampType rows") {
    val fromNanos = Tables.table(spark, nanosDir, "events")
    val fromMicros = Tables.table(spark, microsDir, "events")
    assert(fromNanos.schema("ts").dataType.typeName == "timestamp", fromNanos.schema)
    assert(fromMicros.schema("ts").dataType.typeName == "timestamp", fromMicros.schema)
    val expected = Seq(
      0L -> "2024-03-01 00:00:00", 1L -> "2024-03-01 12:30:00",
      2L -> "2024-03-02 00:00:00", 3L -> "2024-03-03 06:00:00")
    assert(tsRows(fromNanos) == expected)
    assert(tsRows(fromMicros) == expected)
  }

  test("eventsBetween filters identically and pushes the range to the scan in both encodings") {
    val from = "2024-03-01T12:00:00Z"
    val until = "2024-03-03T00:00:00Z"
    Seq(nanosDir, microsDir).foreach { dir =>
      val df = Tables.eventsBetween(spark, dir, from, until)
      assert(tsRows(df) == Seq(
        1L -> "2024-03-01 12:30:00", 2L -> "2024-03-02 00:00:00"), dir)
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("GreaterThanOrEqual(ts"), s"$dir range not pushed:\n$plan")
      assert(plan.contains("LessThan(ts"), s"$dir range not pushed:\n$plan")
    }
  }
}
