package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.StructureQueries

/** Invariants for the structural family (triangles, inverted index,
  * k-anonymity) beyond the oracle hash. */
class StructureQueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("triangles: degree-ordered enumeration matches the naive id-ordered count per node") {
    val got = StructureQueries.q_triangles(spark, dir)

    // naive reference: a<b<c join chain on the same edge set
    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val naive = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("node").asc).limit(100)

    assert(got.collect().toSeq == naive.collect().toSeq)
  }

  test("inverted index: postings truncate at the configured bound and stats dominate them") {
    val nDocs = Tables.table(spark, dir, "documents").count()
    StructureQueries.q_inverted_index(spark, dir).collect().foreach { r =>
      val df = r.getAs[Long]("df")
      val posts = r.getAs[String]("postings").split(",")
      assert(df <= nDocs && df >= 1)
      assert(posts.length == math.min(df, 10L).toInt, r)
      assert(r.getAs[Long]("tf_total") >= df)
      // postings are doc-ordered
      val ids = posts.map(_.split(":")(0).toLong).toSeq
      assert(ids == ids.sorted)
    }
  }

  test("k-anonymity: released cells respect k, levels partition the population") {
    val rows = StructureQueries.q_k_anon(spark, dir).collect()
    val k = 10
    rows.filter(r => r.getAs[Int]("level") < 2)
      .foreach(r => assert(r.getAs[Long]("n") >= k, r))
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.table(spark, dir, "customer").count())
  }
}
