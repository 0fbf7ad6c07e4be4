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
}
