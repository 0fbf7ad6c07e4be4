package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forward-guard for the other drift-prone testdata columns: the
  * generator has already flipped `events.ts` between parquet
  * encodings mid-round (see EventsEncodingSpec); `o_orderdate` /
  * `l_shipdate` currently arrive as native TIMESTAMP_NTZ but have
  * the same exposure to a regeneration shipping ISO strings or DATE.
  *
  * The engine's consumption patterns are tolerant BY DISCIPLINE —
  * `to_date(...)` projections, range filters against cast literals,
  * and ISO-ordering (lexicographic string order == chronological) —
  * and this spec pins that discipline across the three plausible
  * encodings, so a new query hard-wiring one encoding fails here
  * before a regeneration can take the suite down. */
class DateEncodingSpec extends SparkSpec {

  private val base = Files.createTempDirectory("graft-date-enc").toString

  private def writeOrders(sub: String, encode: DataFrame => DataFrame): String = {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, "1995-12-31", 100.0, "1-URGENT"),
      (2L, 11L, "1996-01-01", 200.0, "2-HIGH"),
      (3L, 10L, "1996-06-15", 300.0, "1-URGENT"),
      (4L, 12L, "1997-01-01", 400.0, "3-MEDIUM"))
    val df = rows.toDF("o_orderkey", "o_custkey", "o_orderdate",
      "o_totalprice", "o_orderpriority")
    encode(df).write.mode("overwrite").parquet(s"$base/$sub/orders.parquet")
    s"$base/$sub"
  }

  private val asString = writeOrders("str", identity)
  private val asDate = writeOrders("date",
    _.withColumn("o_orderdate", col("o_orderdate").cast("date")))
  private val asTsNtz = writeOrders("ntz",
    _.withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz")))
  private val encodings = Seq(asString, asDate, asTsNtz)

  test("to_date projection and ISO ordering agree across string/date/timestamp encodings") {
    val expect = encodings.map { dir =>
      graft.io.Tables.table(spark, dir, "orders")
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).cast("string").as("d"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    }
    assert(expect.distinct.size == 1, expect)
    assert(expect.head.map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("timestamp-literal range filter keeps the same rows in every encoding") {
    val got = encodings.map { dir =>
      graft.io.Tables.table(spark, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey").orderBy("o_orderkey")
        .collect().toSeq.map(_.getLong(0))
    }
    assert(got.distinct.size == 1, got)
    assert(got.head == Seq(2L, 3L))
  }
}
