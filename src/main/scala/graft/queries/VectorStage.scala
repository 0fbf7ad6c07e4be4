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

  /** This stage's rows in [[Stages.persistableArtifacts]]. */
  private[graft] def persistableArtifacts
      : Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "vector.kmQuantized" -> (quantizedEmbeddings _),
    "vector.kmPriorState" -> (kmPriorState _))
}
