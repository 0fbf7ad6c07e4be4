package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.vector.IvfIndex

/** Streaming front door of IVF ANN serving — the vector twin of
  * [[StreamingDedup.dupsAgainstIndex]]: query vectors arrive as a
  * (vec_id, embedding) stream, the PERSISTED index (broadcast
  * centroid literals + static posting table — the artifacts
  * `q_ann_ivf_incremental` maintains daily) is STATIC, and each
  * micro-batch is served statelessly: nProbe cell assignment is
  * map-only against the centroid literals, the candidate join touches
  * only the probed cells' postings, and exact cosine ranks the
  * candidates.
  *
  * Structure: a query's result depends only on the static index,
  * never on other stream elements, so per-batch top-k inside
  * `foreachBatch` is exact and batch-split invariance is STRUCTURAL
  * (the spec asserts it against the one-shot batch probe anyway).
  * All heavy state lives in the index; there is no watermark state to
  * size. The probe's query side is broadcast
  * ([[IvfIndex.topKOverPostings]]) — a micro-batch of queries is
  * always small next to the posting table, so the index never
  * shuffles per batch. */
object StreamingAnn {

  /** Full pipeline: per micro-batch, rank the arriving queries
    * against the static index and hand (query_id, rank, neighbor_id,
    * cosine) to the sink callback — the standard exactly-once
    * foreachBatch sink shape. */
  def topKAgainstIndex(
      queries: DataFrame,
      postings: DataFrame,
      centroids: Seq[IvfIndex.Centroid],
      nProbe: Int, k: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(IvfIndex.topKOverPostings(postings, batch, centroids, nProbe, k), id)
      }
}
