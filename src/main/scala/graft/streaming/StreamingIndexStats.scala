package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.PipelineQueries

/** Live BM25 corpus statistics over a document stream — the streaming
  * cadence of `q_bm25_incremental`'s daily partial merge: the stats
  * (n_docs, Σdl, per-term df) are ADDITIVE sufficient statistics, so
  * the stream maintains them as one global complete-mode aggregation
  * whose state is a single row of k+2 longs (no watermark — nothing
  * to evict). The per-document tokenize/tf projection is LITERALLY
  * the batch scorer's ([[PipelineQueries.bm25BaseFrame]] — the same
  * Catalyst expressions, the StreamingDrift convention), so after ANY
  * micro-batch split of the same corpus the final emission is
  * bit-equal to the batch stats row; a consumer scores documents
  * against the latest emission with the unchanged per-doc math. */
object StreamingIndexStats {

  def bm25StatsStream(docs: DataFrame): DataFrame =
    PipelineQueries.bm25Stats(PipelineQueries.bm25BaseFrame(docs))
}
