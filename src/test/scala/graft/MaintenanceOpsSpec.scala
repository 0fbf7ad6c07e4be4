package graft

import org.apache.spark.sql.functions._

import graft.etl.Compaction
import graft.text.TextOps

/** Production-shape maintenance: incremental dedup against a persisted
  * band index, and small-file compaction. */
class MaintenanceOpsSpec extends SparkSpec {
  import spark.implicits._

  test("incremental minhash dedup matches the full recompute on the batch slice") {
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val isBatch = col("doc_id") % 5 === 0
    val corpus = docs.where(!isBatch)
    val batch = docs.where(isBatch)
    // "persisted" index of the historical corpus
    val index = TextOps.lshBandRows(corpus, 3, 16, 8)
    val incremental = TextOps
      .minhashDupAgainstIndex(index, batch, 3, 16, 8, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // ground truth: full-corpus pairs restricted to batch×corpus
    val full = TextOps.minhashDupPairs(docs, 3, 16, 8, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val crossPairs = full.collect {
      case (a, b, j) if a % 5 == 0 ^ b % 5 == 0 =>
        if (a % 5 == 0) (a, b, j) else (b, a, j)
    }
    assert(incremental == crossPairs, s"\ninc:  $incremental\nfull: $crossPairs")
  }

  test("curation funnel: flags are consistent and kept docs pass every gate") {
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.01", "documents")
    val out = graft.text.Curation.curate(docs).cache()
    val total = out.count()
    assert(total == docs.count())
    val kept = out.where(col("kept"))
    assert(kept.count() > 0 && kept.count() < total) // funnel actually filters
    // no kept doc violates any gate
    assert(kept.where(
      col("is_eval") || col("is_exact_dup") || col("is_near_dup") ||
        col("is_contaminated") || !col("sampled_in") ||
        col("predicted") === "und" || col("quality") < 0.5 ||
        !col("n_tokens").between(5, 1000)).isEmpty)
    // every eval doc is excluded from training regardless of other flags
    assert(out.where(col("is_eval") && col("kept")).isEmpty)
    // exact-dup groups keep exactly their canonical member
    val exDup = out.where(col("is_exact_dup")).count()
    val exGroups = graft.text.TextOps.exactDupGroups(docs)
      .where(col("n_copies") > 1)
    val expectedLosers = exGroups.agg(
      coalesce(sum(col("n_copies") - 1), lit(0L))).head().getLong(0)
    assert(exDup == expectedLosers)
    out.unpersist()
  }

  test("a bucketed band index joins the daily batch without shuffling the index side") {
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val isBatch = col("doc_id") % 5 === 0
    // persist the historical index bucketed on the join key (writer
    // aligned: one file per bucket)
    TextOps.lshBandRows(docs.where(!isBatch), 3, 16, 8)
      .repartition(8, col("band_idx"), col("band_hash"))
      .write.mode("overwrite")
      .bucketBy(8, "band_idx", "band_hash")
      .option("path", "/tmp/graft_band_index").format("parquet")
      .saveAsTable("graft_band_index")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = TextOps.minhashDupAgainstIndex(
        spark.table("graft_band_index"), docs.where(isBatch), 3, 16, 8, 0.5)
      out.collect()
      val plan = out.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==")(0)
      assert(plan.contains("Bucketed: true"), plan)
      // ONE exchange on the band keys: the (small) batch side aligning
      // to the index's buckets — the index itself never shuffles
      val bandExchanges =
        "Exchange hashpartitioning\\(band_idx".r.findAllIn(plan).size
      assert(bandExchanges == 1,
        s"only the batch side should shuffle on the band keys, got $bandExchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_band_index")
    }
  }

  test("compaction collapses many small files into the computed target count") {
    val path = "/tmp/graft_compact/orders"
    val src = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "orders")
    src.repartition(40).write.mode("overwrite").parquet(path) // simulate micro-batch litter
    val rowsBefore = spark.read.parquet(path).count()
    val (before, after) = Compaction.compact(spark, path)
    assert(before == 40 && after == 1, s"before=$before after=$after")
    assert(spark.read.parquet(path).count() == rowsBefore)
  }
}
