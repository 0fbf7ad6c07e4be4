package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.SelectionQueries
import graft.text.TextOps

/** Invariants for the data-selection family (boilerplate strip, DSIR
  * importance weights) beyond the oracle hash. */
class SelectionQueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("boilerplate: exact-duplicate documents lose every chunk; accounting is consistent") {
    val docs = Tables.table(spark, dir, "documents")
    val report = SelectionQueries.q_boilerplate(spark, dir)

    // members of exact-dup groups share every chunk with their twin →
    // all chunks cross the df >= 2 bar and nothing survives
    val dupHashes = TextOps.exactDupGroups(docs)
      .filter(col("n_copies") >= 2).select("content_md5")
    val dupDocs = docs.select(col("doc_id"), md5(col("text")).as("content_md5"))
      .join(dupHashes, "content_md5").select("doc_id")
    val survivors = report.join(dupDocs, "doc_id")
      .filter(col("kept_tokens") > 0 || col("n_dropped") =!= col("n_chunks"))
    assert(survivors.count() == 0)

    // per-doc accounting: dropped <= chunks, kept_tokens <= token total
    val toks = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_toks"))
    val bad = report.join(toks, "doc_id").filter(
      col("n_dropped") > col("n_chunks") || col("kept_tokens") > col("n_toks") ||
        (col("n_dropped") === 0 && col("kept_tokens") =!= col("n_toks")))
    assert(bad.count() == 0)
  }

  test("source cap: heap top-k equals a window-rank replay; every source capped") {
    val got = SelectionQueries.q_source_cap(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

    // window-function replay of the same cap
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextOps.qualityExpr(split(col("text"), " ")).as("quality"))
    val expected = scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("quality").desc, col("doc_id").asc)).cast("int"))
      .filter(col("rank") <= SelectionQueries.SourceCapK)
      .orderBy(col("source").asc, col("rank").asc)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("quality"))).toSeq
    assert(got == expected && got.nonEmpty)
    got.groupBy(_._1).values.foreach(g =>
      assert(g.size <= SelectionQueries.SourceCapK))
  }

  test("psi: non-negative for every source, zero-drift self-comparison, token accounting") {
    val rows = SelectionQueries.q_psi(spark, dir).collect()
    assert(rows.nonEmpty)
    // PSI terms (p−q)·ln(p/q) are individually non-negative; the only
    // slack is the 9-dp term quantization (≤1e-6 after the final round)
    rows.foreach { r =>
      assert(r.getAs[Double]("psi") >= -1e-6, r)
      assert(r.getAs[Long]("n_ref_tokens") > 0 && r.getAs[Long]("n_cur_tokens") > 0, r)
    }
    // total token accounting: ref+cur across sources = corpus tokens
    val total = rows.map(r => r.getAs[Long]("n_ref_tokens") + r.getAs[Long]("n_cur_tokens")).sum
    val corpus = Tables.table(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total == corpus)
  }

  test("dsir: output is raw-corpus only, bigram counts match doc length, weights are finite and sorted") {
    val docs = Tables.table(spark, dir, "documents")
    val top = SelectionQueries.q_dsir(spark, dir)
    val joined = top.join(docs.select(col("doc_id"), col("source"),
      (size(split(col("text"), " ")) - 1).cast("long").as("expect_bg")), "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("source") != "src0", r)
      assert(r.getAs[Long]("n_bigrams") == r.getAs[Long]("expect_bg"), r)
      assert(!r.getAs[Double]("logw").isNaN && !r.getAs[Double]("logw").isInfinite)
    }
    val ws = top.collect().map(_.getAs[Double]("logw")).toSeq
    assert(ws == ws.sorted.reverse, "top-k must be weight-descending")
  }
}
