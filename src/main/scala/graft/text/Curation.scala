package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full corpus-curation funnel — the composition a training-data
  * pipeline actually runs, as ONE DataFrame program with an audit
  * trail: every document gets a flag per stage and a final `kept`,
  * so curation decisions are inspectable (and reversible) instead of
  * silently filtered away.
  *
  * Stages (all built from the engine's primitives, all
  * engine-portable/deterministic):
  *   1. token-count gate ([[TextOps.withTokens]]);
  *   2. quality gate (uniqueness/stopword blend, [[TextOps.qualityScore]]);
  *   3. language-ID gate ([[TextOps.langId]] — "und" drops);
  *   4. exact dedup — non-canonical md5 copies drop;
  *   5. near dedup — the worse side (larger doc_id) of every MinHash
  *      pair drops;
  *   6. decontamination — ≥ `contamShingles` shingles shared with the
  *      eval slice drops; eval docs themselves never enter training;
  *   7. deterministic hash downsampling.
  *
  * Scale notes: stages 1-3 and 7 are map-only; 4 is one shuffle on
  * the content hash; 5 is the LSH band join; 6 broadcasts the eval
  * shingle set. Flags are computed with left joins against the small
  * "loser" sets, so the doc table streams once.
  */
object Curation {

  final case class Config(
      minTokens: Int = 5,
      maxTokens: Int = 1000,
      minQuality: Double = 0.5,
      shingleN: Int = 3,
      minhashK: Int = 16,
      minhashBands: Int = 8,
      nearDupThreshold: Double = 0.5,
      contamShingles: Int = 5,
      // keep iff first hex digit of md5("smpl:"++id) < sampleHexLt
      sampleHexLt: String = "e",
      evalModulus: Int = 97)

  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val isEval = col("doc_id") % cfg.evalModulus === 0

    val stats = TextOps.qualityScore(docs)
      .join(TextOps.tokenStats(docs).select("doc_id", "n_tokens"), "doc_id")
      .select("doc_id", "n_tokens", "quality")
    val lang = TextOps.langId(docs).select(col("doc_id"), col("predicted"))

    val exactLosers = TextOps.exactDupGroups(docs)
      .where(col("n_copies") > 1)
      .join(docs.select(md5(col("text")).as("content_md5"), col("doc_id")), "content_md5")
      .where(col("doc_id") =!= col("canonical_doc_id"))
      .select(col("doc_id"), lit(true).as("is_exact_dup"))

    val nearLosers = TextOps.minhashDupPairs(
      docs, cfg.shingleN, cfg.minhashK, cfg.minhashBands, cfg.nearDupThreshold)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("is_near_dup", lit(true))

    val contaminated = {
      val evalShingles = TextOps.shingleRows(docs.where(isEval), cfg.shingleN)
        .select("shingle").distinct()
      TextOps.shingleRows(docs.where(!isEval), cfg.shingleN)
        .join(broadcast(evalShingles), "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= cfg.contamShingles)
        .select(col("doc_id"), lit(true).as("is_contaminated"))
    }

    def flag(c: Column): Column = coalesce(c, lit(false))

    docs.select(col("doc_id"), col("lang").as("lang_actual"))
      .join(stats, "doc_id")
      .join(lang, "doc_id")
      .join(exactLosers, Seq("doc_id"), "left")
      .join(nearLosers, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"), col("quality"), col("predicted"),
        isEval.as("is_eval"),
        flag(col("is_exact_dup")).as("is_exact_dup"),
        flag(col("is_near_dup")).as("is_near_dup"),
        flag(col("is_contaminated")).as("is_contaminated"),
        (substring(md5(concat(lit("smpl:"), col("doc_id").cast("string"))), 1, 1)
          < cfg.sampleHexLt).as("sampled_in"))
      .withColumn("kept",
        !col("is_eval") && col("sampled_in") &&
          !col("is_exact_dup") && !col("is_near_dup") && !col("is_contaminated") &&
          col("predicted") =!= "und" &&
          col("quality") >= cfg.minQuality &&
          col("n_tokens").between(cfg.minTokens, cfg.maxTokens))
      .orderBy(col("doc_id").asc)
  }
}
