package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.vector.DistributedKMeans

/** Staged embedding-collection artifacts (the [[StageCache]]
  * contract, like [[GraphStage]]/[[DedupStage]]/[[LmStage]]): the
  * quantized coordinate table every k-means pass scans, and
  * "yesterday's committed centroid state" — the day-1 trained
  * [[DistributedKMeans.CellState]] rows the online fold seeds from.
  * In production the prior day's centroids are READ from a committed
  * table, not retrained, so the daily query pays only its one
  * batch-fold job; the k×(dim+1)-long state is exactly the mergeable
  * table a warehouse would version alongside the dedup band index. */
object VectorStage {

  private val stage = new StageCache

  def stagedSeconds: Double = stage.stagedSeconds
  private[graft] def clearForTesting(): Unit = stage.clear()
  private[graft] def clearAndFree(): Unit = stage.clearAndFree()
  private[graft] def buildCount: Long = stage.buildCount
  private[graft] def dropMatchingAndFree(sub: String): Int =
    stage.dropMatchingAndFree(sub)

  /** (vec_id, qv) — coordinates quantized once per snapshot
    * ([[CorpusQueries.KmScale]]); both k-means queries scan this
    * every round. */
  def quantizedEmbeddings(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "kmQuantized") {
      DistributedKMeans.quantized(
        Tables.table(spark, dir, "embeddings"), CorpusQueries.KmScale)
        .localCheckpoint(true)
    }

  /** The id split the "days" simulate: day 1 = vec_id ≤ max/2. */
  private[queries] def kmMid(spark: SparkSession, dir: String): Long =
    quantizedEmbeddings(spark, dir)
      .agg(max(col("vec_id"))).head().getLong(0) / 2

  /** Day-1 centroid state: Lloyd over the first half
    * ([[CorpusQueries.KmK]]/[[CorpusQueries.KmIters]]) reduced to the
    * per-cell (sum, cnt, seed) rows — k rows of longs, the table the
    * online fold reads instead of retraining history. */
  def kmPriorState(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "kmPriorState") {
      import spark.implicits._
      val q1 = quantizedEmbeddings(spark, dir)
        .where(col("vec_id") <= kmMid(spark, dir))
      val c1 = DistributedKMeans.train(q1, CorpusQueries.KmK, CorpusQueries.KmIters)
      DistributedKMeans.stateOf(q1, c1).toDF().localCheckpoint(true)
    }

  /** [[kmPriorState]] rehydrated to driver state, cell-ordered. */
  private[queries] def kmPriorCells(spark: SparkSession, dir: String)
      : Seq[DistributedKMeans.CellState] = {
    import spark.implicits._
    kmPriorState(spark, dir).as[DistributedKMeans.CellState]
      .collect().sortBy(_.cell).toSeq
  }

  /** The id split the IVF index simulates: "yesterday's corpus" is
    * vec_id % 4 ≠ 0, today's batch the % 4 = 0 quarter — the same
    * batch convention as [[CorpusQueries.q_phash_incremental]] /
    * `q_dedup_incremental`. */
  private[queries] def ivfPrior(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings").where(col("vec_id") % 4 =!= 0)

  /** Yesterday's coarse quantizer: [[graft.vector.IvfIndex.train]]
    * over the prior slice, persisted as the k-row (cell, vec) table a
    * warehouse versions next to the postings. Training is driver-side
    * over a bounded sample (the FAISS recipe), so this artifact's
    * build cost never scales with the corpus. */
  def ivfPriorCentroids(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "ivfPriorCentroids") {
      import spark.implicits._
      graft.vector.IvfIndex
        .train(ivfPrior(spark, dir), CorpusQueries.IvfK, CorpusQueries.IvfIters)
        .toDF().localCheckpoint(true)
    }

  /** [[ivfPriorCentroids]] rehydrated to driver literals, cell-ordered
    * (k × dim doubles — the whole index state that leaves the cluster). */
  private[graft] def ivfPriorCentroidSeq(spark: SparkSession, dir: String)
      : Seq[graft.vector.IvfIndex.Centroid] = {
    import spark.implicits._
    ivfPriorCentroids(spark, dir).as[graft.vector.IvfIndex.Centroid]
      .collect().sortBy(_.cell).toSeq
  }

  /** Yesterday's posting table: the prior slice cell-assigned against
    * [[ivfPriorCentroids]] ([[graft.vector.IvfIndex.assign]]) — the
    * corpus-scale O(n·k) map pass a daily pipeline pays ONCE and then
    * only appends to. */
  def ivfPriorPostings(spark: SparkSession, dir: String): DataFrame =
    stage(spark, dir, "ivfPriorPostings") {
      graft.vector.IvfIndex
        .assign(ivfPrior(spark, dir), ivfPriorCentroidSeq(spark, dir))
        .localCheckpoint(true)
    }

  /** This stage's rows in [[Stages.persistableArtifacts]]. */
  private[graft] def persistableArtifacts
      : Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "vector.kmQuantized" -> (quantizedEmbeddings _),
    "vector.kmPriorState" -> (kmPriorState _),
    "vector.ivfPriorCentroids" -> (ivfPriorCentroids _),
    "vector.ivfPriorPostings" -> (ivfPriorPostings _))
}
