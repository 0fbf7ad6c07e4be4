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

  test("unpivot is the dense inverse of pivot: zero gap cells kept, non-zero cells match the fact") {
    val dir = "/root/testdata/sf0.001"
    val long = ScaleQueries.q_unpivot(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("date").toString,
        r.getAs[String]("platform"), r.getAs[Long]("n_events")))
    val fact = graft.io.Tables.table(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("date"), col("event_type").as("platform"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[java.sql.Date]("date").toString,
        r.getAs[String]("platform")) -> r.getAs[Long]("n")).toMap
    val nDates = long.map(_._1).distinct.length
    assert(long.length == nDates * 5) // dense: every (date, platform) cell
    long.foreach { case (d, p, n) =>
      assert(n == fact.getOrElse((d, p), 0L), s"($d, $p)")
    }
    assert(long.exists(_._3 == 0L) || fact.size == long.length)
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

  test("HLL sketch union is split-invariant: merge of arbitrary partial sketches equals the one-shot sketch") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.io.Tables.table(spark, dir, "events")
    val h = md5(concat(lit("hll:"), col("user_id").cast("string")))
    val zr = length(regexp_extract(col("rest"), "^0*", 0))
    val nextc = col("rest").substr(zr + lit(1), lit(1))
    val clz4 = when(nextc < "2", 3).when(nextc < "4", 2)
      .when(nextc < "8", 1).otherwise(0)
    val rho = (lit(4) * zr + when(zr === 13, 0).otherwise(clz4) + lit(1)).cast("long")
    val withRho = ev
      .select(col("event_id"), substring(h, 1, 2).as("bucket"), substring(h, 3, 13).as("rest"))
      .select(col("event_id"), col("bucket"), rho.as("rho"))
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("bucket").agg(max(col("rho")).as("m"))
    val oneShot = sketch(withRho)
      .orderBy("bucket").as[(String, Long)].collect().toSeq
    // split on an arbitrary non-semantic key (event_id mod 7): partial
    // sketches per split, merged by bucket-wise max — the daily-rollup path
    val merged = withRho
      .withColumn("split", pmod(col("event_id"), lit(7)))
      .groupBy("split", "bucket").agg(max(col("rho")).as("m"))
      .groupBy("bucket").agg(max(col("m")).as("m"))
      .orderBy("bucket").as[(String, Long)].collect().toSeq
    assert(merged === oneShot && oneShot.nonEmpty)
  }

  test("q_hll_rollup estimate stays within 5% of exact at sf0.001") {
    val out = ScaleQueries.q_hll_rollup(spark, "/root/testdata/sf0.001")
      .select("platform", "est_users", "exact_users", "err_pct").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(3) < 5.0, s"platform=${r.getString(0)} err=${r.getDouble(3)}")
    }
  }

  test("q_perplexity keeps exactly floor(0.9 n) docs, dropping the highest-ppl tail") {
    val out = graft.queries.AdvancedQueries.q_perplexity(spark, "/root/testdata/sf0.001")
      .select("doc_id", "ppl", "keep").collect()
    val n = out.length.toLong
    val kept = out.count(_.getBoolean(2)).toLong
    assert(kept === n * 9 / 10, s"kept=$kept n=$n")
    val maxKept = out.filter(_.getBoolean(2)).map(_.getDouble(1)).max
    val minDropped = out.filterNot(_.getBoolean(2)).map(_.getDouble(1)).min
    assert(maxKept <= minDropped,
      s"kept ppl $maxKept exceeds dropped ppl $minDropped")
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
