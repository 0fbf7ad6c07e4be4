package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ExactRank

/** [[ExactRank]] must be BIT-IDENTICAL to the single-partition window
  * forms it replaces (the oracle hashes of q_histogram / q_curriculum
  * / q_winsorize / q_union_tagged depend on it), and invariant to the
  * partition count — the property that makes the plan swap safe. */
class ExactRankSpec extends SparkSpec {
  import spark.implicits._

  // values with heavy ties (i % 7) force the tiebreaker to matter;
  // 103 is deliberately coprime with every partition count tried
  private def sample(n: Int): DataFrame =
    (0 until n).map(i => ((i * 53) % 103, i % 7, s"k$i")).toDF("id", "v", "s")

  private def windowRank(df: DataFrame): DataFrame =
    df.withColumn("_gr",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))

  test("global rank matches row_number() for every partition count") {
    val df = sample(103)
    val expected = windowRank(df).orderBy("id").collect().toSeq
    for (p <- Seq(1, 3, 4, 7, 32)) {
      val (ranked, n) = ExactRank.withGlobalRank(
        df, Seq(col("v").asc, col("id").asc), "_gr", numPartitions = p)
      assert(n == 103L)
      assert(ranked.orderBy("id").collect().toSeq == expected, s"p=$p")
    }
  }

  test("ntileFromRank matches ntile(k) for uneven and tiny n") {
    for (n <- Seq(1, 3, 10, 37, 103); k <- Seq(3, 4, 10)) {
      val df = sample(n)
      val viaWindow = df
        .withColumn("b",
          ntile(k).over(Window.orderBy(col("v").asc, col("id").asc)))
        .select("id", "b").orderBy("id").collect().toSeq
      val (ranked, total) = ExactRank.withGlobalRank(
        df, Seq(col("v").asc, col("id").asc), "_gr", numPartitions = 4)
      val viaMath = ranked
        .withColumn("b", ExactRank.ntileFromRank("_gr", total, k))
        .select("id", "b").orderBy("id").collect().toSeq
      assert(viaMath == viaWindow, s"n=$n k=$k")
    }
  }

  test("exclusive prefix max matches the window form for every partition count") {
    val df = sample(103).withColumn("lv", col("id").cast("long") * 7 % 61)
    val w = Window.orderBy(col("v").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df
      .withColumn("_pm", coalesce(max(col("lv")).over(w), lit(Long.MinValue)))
      .orderBy("id").collect().toSeq
    for (p <- Seq(1, 3, 4, 7, 32)) {
      val swept = ExactRank.withExclusivePrefixMax(
        df, Seq(col("v").asc, col("id").asc), "lv", "_pm", numPartitions = p)
      assert(swept.orderBy("id").collect().toSeq == expected, s"p=$p")
    }
  }

  test("ntileOffset restarts row_number inside each bucket") {
    val df = sample(37)
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val viaWindow = df
      .withColumn("tier", ntile(4).over(w))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy("tier").orderBy(col("v").asc, col("id").asc)))
      .select("id", "tier", "pos").orderBy("id").collect().toSeq
    val (ranked, n) = ExactRank.withGlobalRank(
      df, Seq(col("v").asc, col("id").asc), "_gr", numPartitions = 5)
    val viaMath = ranked
      .withColumn("tier", ExactRank.ntileFromRank("_gr", n, 4))
      .withColumn("pos",
        (col("_gr") - ExactRank.ntileOffset("tier", n, 4)).cast("int"))
      .select("id", "tier", "pos").orderBy("id").collect().toSeq
    assert(viaMath == viaWindow)
  }

  test("parity with the window form at 50k rows, heavy ties and null keys") {
    import spark.implicits._
    // 1000-way ties force cross-partition tie groups; every 97th key is
    // NULL (asc ⇒ nulls first, same in both forms); id is the tiebreak
    val big = spark.range(50000).select(
      when(col("id") % 97 === 0, lit(null))
        .otherwise(pmod(col("id") * 7919, lit(1000))).as("v"),
      col("id"))
    val expected = windowRank(big).orderBy("id").collect().toSeq
    val (ranked, n) = ExactRank.withGlobalRank(
      big, Seq(col("v").asc, col("id").asc), "_gr", numPartitions = 16)
    assert(n == 50000L)
    assert(ranked.orderBy("id").collect().toSeq == expected)
  }

  test("the ranked frame is genuinely range-distributed, not funneled") {
    val (ranked, n) = ExactRank.withGlobalRank(
      sample(103), Seq(col("v").asc, col("id").asc), "_gr", numPartitions = 4)
    val rdd = ranked.rdd
    assert(rdd.getNumPartitions == 4)
    val counts = rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    // no partition may hold the whole input (the property the
    // single-partition-window lint cannot see through the RDD boundary)
    assert(counts.max < n, counts.mkString(","))
    assert(counts.count(_ > 0) >= 2, counts.mkString(","))
  }

  test("the full window-function family derives from ExactRank math, bit-equal") {
    // rank / dense_rank / percent_rank / cume_dist / ntile over a
    // low-cardinality PARTITION BY (q_window_funcs' shape) all reduce
    // to ONE group-major ExactRank pass + joins over domain-bounded
    // aggregates — the distributed form if the partition key's groups
    // ever outgrow one reducer. Proven bit-equal to the native window
    // functions here, ties and all.
    val c = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_mktsegment").as("g"), col("c_custkey").as("id"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val tied = Window.partitionBy("g").orderBy(col("band").asc)
    val total = Window.partitionBy("g").orderBy(col("band").asc, col("id").asc)
    val expected = c.select(col("g"), col("id"),
        rank().over(tied).cast("int").as("rnk"),
        dense_rank().over(tied).cast("int").as("drnk"),
        round(percent_rank().over(tied), 6).as("prank"),
        round(cume_dist().over(tied), 6).as("cdist"),
        ntile(4).over(total).cast("int").as("quartile"))
      .orderBy("g", "id").collect().toSeq

    val (ranked, _) = ExactRank.withGlobalRank(
      c, Seq(col("g").asc, col("band").asc, col("id").asc), "_gr")
    val grp = ranked.groupBy("g")
      .agg(min(col("_gr")).as("gmin"), count(lit(1)).as("n_g"))
    val withR = ranked.join(broadcast(grp), "g")
      .withColumn("r", col("_gr") - col("gmin") + 1)
    val ties = withR.groupBy("g", "band")
      .agg(min(col("r")).as("lo"), max(col("r")).as("hi"))
    // band index within group: window over the AGGREGATED (g, band)
    // table — domain-bounded input, the counting-pass discipline
    val dense = ties.withColumn("d",
      row_number().over(Window.partitionBy("g").orderBy(col("band").asc)))
    val derived = withR.join(dense, Seq("g", "band"))
      .select(col("g"), col("id"),
        col("lo").cast("int").as("rnk"),
        col("d").cast("int").as("drnk"),
        round((col("lo") - 1).cast("double") / (col("n_g") - 1), 6).as("prank"),
        round(col("hi").cast("double") / col("n_g"), 6).as("cdist"),
        expr("CAST(CASE WHEN r <= (n_g % 4) * (n_g DIV 4 + 1)" +
          " THEN (r - 1) DIV (n_g DIV 4 + 1) + 1" +
          " ELSE (n_g % 4) + (r - 1 - (n_g % 4) * (n_g DIV 4 + 1))" +
          " DIV greatest(n_g DIV 4, 1) + 1 END AS INT)").as("quartile"))
      .orderBy("g", "id").collect().toSeq
    assert(derived == expected)
  }

  test("grouped rank matches row_number() PARTITION BY for every partition count") {
    // few huge groups — exactly the shape the hash window serializes;
    // group sizes deliberately unequal and one group NULL
    val df = sample(103).withColumn("g",
      when(col("id") % 11 === 0, lit(null)).otherwise(col("id") % 3))
    val expected = df.withColumn("_gr",
        row_number().over(
          Window.partitionBy("g").orderBy(col("v").asc, col("id").asc))
          .cast("long"))
      .orderBy("id").collect().toSeq
    for (p <- Seq(1, 3, 4, 7, 32)) {
      val ranked = ExactRank.withGroupedRank(
        df, "g", Seq(col("v").asc, col("id").asc), "_gr", numPartitions = p)
      assert(ranked.orderBy("id").collect().toSeq == expected, s"p=$p")
    }
  }

  test("grouped rank stays range-distributed when one group spans partitions") {
    // a single dominant group (90% of rows) must still spread across
    // partitions — the property PARTITION BY fundamentally cannot have
    val df = sample(1000).withColumn("g",
      when(col("id") % 10 === 0, lit("rare")).otherwise(lit("dominant")))
    val ranked = ExactRank.withGroupedRank(
      df, "g", Seq(col("v").asc, col("id").asc), "_gr", numPartitions = 8)
    val counts = ranked.rdd
      .mapPartitions(it => Iterator.single(it.size)).collect()
    assert(counts.max < 900, counts.mkString(","))
    assert(counts.count(_ > 0) >= 4, counts.mkString(","))
  }

  test("empty input ranks to an empty frame with n = 0") {
    val df = sample(10).where(col("id") < -1)
    val (ranked, n) = ExactRank.withGlobalRank(
      df, Seq(col("v").asc, col("id").asc), "_gr", numPartitions = 4)
    assert(n == 0L && ranked.count() == 0L)
  }

  test("schema appends a non-nullable long rank, preserving input columns") {
    val (ranked, _) = ExactRank.withGlobalRank(
      sample(5), Seq(col("v").asc, col("id").asc), "r", numPartitions = 2)
    assert(ranked.columns.toSeq == Seq("id", "v", "s", "r"))
    assert(ranked.schema("r").dataType.typeName == "long")
  }
}
