package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Streaming front door of the corpus-curation funnel
  * ([[graft.text.Curation]] is the batch form): as documents arrive,
  * exact duplicates are dropped on content hash within the watermark
  * horizon and the map-only gates (token count, quality, language)
  * run inline. The corpus-relative stages — near-dup LSH,
  * decontamination, components — need visibility of the accumulated
  * store and stay batch jobs over it (the same split the streaming
  * ranking sink makes for cross-entity total orders).
  *
  * State: keyed by content_md5, evicted by the watermark — bounded by
  * the dedup horizon, not corpus size.
  */
object StreamingCuration {

  def curateStream(
      docs: DataFrame, // doc_id, text, ts (event time)
      watermark: String = "1 day",
      minTokens: Int = 5,
      maxTokens: Int = 1000,
      minQuality: Double = 0.5): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .withWatermark("ts", watermark)
      .withColumn("content_md5", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_md5")
      .withColumn("n_tokens", size(toks))
      // the SHARED batch formulas, not inline copies — a tuning of
      // qualityExpr/langIdExpr applies to both funnels by construction
      .withColumn("quality", TextOps.qualityExpr(toks))
      .withColumn("predicted_lang", TextOps.langIdExpr(toks))
      .where(
        col("n_tokens").between(minTokens, maxTokens) &&
          col("quality") >= minQuality &&
          // the language gate the batch funnel applies (Curation
          // drops predicted == "und"): no stopword set recognizes
          // the text ⇒ out, in BOTH cadences
          col("predicted_lang") =!= "und")
      .select("doc_id", "ts", "content_md5", "n_tokens", "quality")
  }

  /** The FULL funnel at streaming cadence: each micro-batch of
    * `documents`-schema rows folds through [[graft.CorpusEtl
    * .runBatch]] — gates, exact/near dedup against the persisted
    * probe indexes, decontamination against the pinned benchmark —
    * and commits through the store's manifest, exactly as the daily
    * batch main does. The stream IS the batch pipeline at a faster
    * clock: one code path, one store, one audit ledger
    * (StreamingSpec proves any micro-batch split of the corpus is
    * bit-equal to the batch fold, which `q_curate_incremental`'s
    * oracle already pins to one-shot [[graft.text.Curation.curate]]).
    *
    * Exactly-once under replay: foreachBatch is at-least-once, so a
    * recovered batch id that is already committed is SKIPPED (the
    * ledger's batch_id high-water mark is the dedup key — same
    * pattern as the ranking sink); a skipped replay never re-appends
    * and never trips the fresh-batch-id guard. Batch ids are the
    * streaming engine's epoch + 1 (epochs are 0-based, the store's
    * init ledger owns 0).
    *
    * The store commit is the checkpoint: no in-memory state spans
    * micro-batches, so a crash resumes from the last committed
    * manifest with nothing to rebuild. */
  def corpusFoldSink(
      docs: DataFrame, // streaming, documents schema
      storeRoot: String,
      cfg: graft.text.Curation.Config = graft.text.Curation.Config())
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val spark = batch.sparkSession
        if (!batch.isEmpty) {
          val batchId = epoch + 1
          val last = graft.CorpusEtl.lastBatchId(spark, storeRoot)
          // exactly-once under at-least-once replay, WITHOUT silent
          // loss: the stream is the store's only writer (scaladoc
          // contract), so a replayed epoch re-delivers the batch the
          // ledger already holds as its own id — skip. A batch id
          // BEHIND the ledger that is not that replay (a fresh or
          // relocated checkpoint against an advanced store, or an
          // interleaved external writer) is ambiguous between
          // dropping new data and double-folding — fail LOUDLY
          // instead of guessing (the old `<=` skip silently dropped
          // the first N epochs of a fresh checkpoint).
          if (batchId == last) ()
          else if (batchId > last) {
            graft.CorpusEtl.runBatch(spark, storeRoot, batch, batchId, cfg)
            ()
          } else throw new IllegalStateException(
            s"stream epoch $epoch maps to batch $batchId but the store's " +
              s"ledger is at $last — a fresh checkpoint against an advanced " +
              "store (or an external writer) cannot be disambiguated from a " +
              "replay; resume the original checkpoint or init a new store")
        }
      }
}
