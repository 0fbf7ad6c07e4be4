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
