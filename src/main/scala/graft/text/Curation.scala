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

  /** The dedup/decontamination state one [[curateFold]] batch reads
    * and the next one extends — the persistable form of "everything
    * the funnel has seen", none of it document text:
    *
    *  - `hashes`: (content_md5, doc_id) of every doc ever folded —
    *    the exact-dedup probe set. Append-only (duplicate hash rows
    *    are harmless: probes are semi-joins on the hash); doc_id rides
    *    along so erasure ([[graft.CorpusEtl]] `forget`) can address
    *    one document's rows without re-hashing history. ~40 bytes/doc.
    *  - `bandIndex`: [[TextOps.lshBandRows]] of every doc ever folded
    *    — the near-dup probe index. Append-only; at warehouse scale
    *    written bucketed on (band_idx, band_hash) so the daily probe
    *    join is co-located on the index side.
    *  - `evalShingles`: (shingle) of the PINNED benchmark set, fixed
    *    at [[initState]] — contamination is checked against a known
    *    benchmark, never a moving target, so day-1 decisions can't be
    *    invalidated by day-30 arrivals.
    */
  final case class FoldState(
      hashes: DataFrame,
      bandIndex: DataFrame,
      evalShingles: DataFrame)

  /** Day-0 state: empty probe sets + the benchmark's shingles.
    * `evalDocs` is the eval slice itself (the caller decides
    * membership — [[q_curate_incremental]] and the one-shot
    * [[curate]] use the `doc_id % evalModulus` convention). */
  def initState(evalDocs: DataFrame, cfg: Config = Config()): FoldState =
    FoldState(
      hashes = evalDocs.limit(0)
        .select(md5(col("text")).as("content_md5"), col("doc_id")),
      bandIndex = TextOps.lshBandRows(
        evalDocs.limit(0), cfg.shingleN, cfg.minhashK, cfg.minhashBands),
      evalShingles = TextOps.shingleRows(evalDocs, cfg.shingleN)
        .select("shingle").distinct())

  /** What one [[curateFoldDelta]] batch ADDS to the fold state — the
    * exact frames an O(batch) append commit persists
    * ([[graft.etl.ManifestParquet]]): the batch's content hashes and
    * its LSH band rows. `state ∪ delta` is the next [[FoldState]];
    * the eval shingle set never changes (pinned at init). */
  final case class FoldDelta(hashes: DataFrame, bandIndex: DataFrame)

  /** INCREMENTAL curation — one day's batch through the same funnel
    * as [[curate]], against [[FoldState]] instead of the whole
    * corpus: the shape that makes curation affordable at 100 TB,
    * where history is petabytes already judged and the batch is a
    * day's crawl. Per-day work is batch-proportional: gates 1-3 and
    * sampling are map-only over the batch; exact dedup is the batch's
    * 32-byte hashes semi-probing the hash set; near dedup is the
    * batch's band rows self-joined (within-day pairs) plus probed
    * against the band index (history never re-shingles); and
    * contamination joins batch shingles to the pinned benchmark set.
    * History is touched only through its indexes.
    *
    * Semantics: FIRST ARRIVAL WINS — a batch doc duplicating
    * anything already folded is the loser, and within a batch the
    * smaller doc_id wins (the [[curate]] rule). When batches arrive
    * in ascending doc_id order and `state.evalShingles` was pinned
    * from the full corpus's eval slice, folding the batches emits
    * bit-for-bit the flags of one-shot [[curate]] over their union —
    * CorpusEtlSpec asserts it, and `q_curate_incremental` proves it
    * against `q_curate`'s own oracle SQL (one oracle, two plans).
    *
    * Returns (per-doc flags frame — [[curate]]'s exact schema — and
    * the extended state). Both state appends reuse the ONE
    * [[TextOps.lshBandRows]]/md5 computation this fold already did;
    * callers persisting state (graft.CorpusEtl) materialize it
    * through their commit, so nothing is shingled twice. */
  def curateFold(batch: DataFrame, state: FoldState,
      cfg: Config = Config()): (DataFrame, FoldState) = {
    val (flags, delta) = curateFoldDelta(batch, state, cfg)
    (flags, FoldState(
      hashes = state.hashes.unionByName(delta.hashes),
      bandIndex = state.bandIndex.unionByName(delta.bandIndex),
      evalShingles = state.evalShingles))
  }

  /** As [[curateFold]], returning the state DELTA instead of the
    * unioned next state — what a store that can APPEND (bytes ∝
    * batch) wants to persist. [[curateFold]] is `state ∪ delta`. */
  def curateFoldDelta(batch: DataFrame, state: FoldState,
      cfg: Config = Config()): (DataFrame, FoldDelta) = {
    val isEval = col("doc_id") % cfg.evalModulus === 0

    // ALL map-side signals in ONE tokenize pass (n_tokens, quality,
    // language vote share the same expressions their standalone
    // operators use — bit-identical, one scan instead of three and
    // one join instead of two; the flag spine then streams the batch
    // once against the small loser sets)
    val signals = signalColumns(batch)

    val batchHashes = batch.select(md5(col("text")).as("content_md5"), col("doc_id"))
    // exact losers: non-canonical within the batch, or any copy of a
    // hash history has already accepted a canonical for
    val exactLosers = TextOps.exactDupGroups(batch)
      .where(col("n_copies") > 1)
      .join(batchHashes, "content_md5")
      .where(col("doc_id") =!= col("canonical_doc_id"))
      .select("doc_id")
      .union(batchHashes
        .join(state.hashes, Seq("content_md5"), "left_semi")
        .select("doc_id"))
      .distinct()
      .withColumn("is_exact_dup", lit(true))

    // near losers: larger side of a within-batch pair, or any batch
    // doc whose bands hit the history index (history side always
    // wins — it was folded first)
    val br = TextOps.lshBandRows(batch, cfg.shingleN, cfg.minhashK, cfg.minhashBands)
    val nearLosers = TextOps.minhashDupPairsFromBands(br, cfg.nearDupThreshold)
      .select(col("b").as("doc_id"))
      .union(TextOps.minhashDupAgainstIndexFromBands(
        state.bandIndex, br, cfg.nearDupThreshold)
        .select(col("a").as("doc_id")))
      .distinct()
      .withColumn("is_near_dup", lit(true))

    val contaminated = TextOps.shingleRows(batch.where(!isEval), cfg.shingleN)
      .join(broadcast(state.evalShingles), "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= cfg.contamShingles)
      .select(col("doc_id"), lit(true).as("is_contaminated"))

    def flag(c: Column): Column = coalesce(c, lit(false))

    val flags = signals
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

    (flags, FoldDelta(hashes = batchHashes, bandIndex = br))
  }

  /** The funnel's map-side per-doc signals in ONE tokenize pass —
    * the same expressions [[TextOps.tokenStats]]/[[TextOps
    * .qualityScore]]/[[TextOps.langId]] apply standalone (bit-
    * identical outputs), computed together so the corpus scans once
    * for all three instead of once each. */
  private def signalColumns(docs: DataFrame): DataFrame =
    TextOps.withTokens(docs).select(
      col("doc_id"),
      size(col("tokens")).cast("bigint").as("n_tokens"),
      TextOps.qualityExpr(col("tokens")).as("quality"),
      TextOps.langIdExpr(col("tokens")).as("predicted"))

  /** One-shot funnel. `nearDupPairs`, when given, must be the
    * [[TextOps.minhashDupPairs]] output over the SAME `docs` at the
    * SAME (shingleN, minhashK, minhashBands, nearDupThreshold) — the
    * per-snapshot materialized pair table a production pipeline
    * shares across its dedup consumers
    * ([[graft.queries.DedupStage.minhashPairs]]); the default mines
    * the pairs inline, bit-identically. */
  def curate(docs: DataFrame, cfg: Config = Config(),
      nearDupPairs: Option[DataFrame] = None): DataFrame = {
    val isEval = col("doc_id") % cfg.evalModulus === 0

    val signals = signalColumns(docs)

    val exactLosers = TextOps.exactDupGroups(docs)
      .where(col("n_copies") > 1)
      .join(docs.select(md5(col("text")).as("content_md5"), col("doc_id")), "content_md5")
      .where(col("doc_id") =!= col("canonical_doc_id"))
      .select(col("doc_id"), lit(true).as("is_exact_dup"))

    val nearLosers = nearDupPairs
      .getOrElse(TextOps.minhashDupPairs(
        docs, cfg.shingleN, cfg.minhashK, cfg.minhashBands, cfg.nearDupThreshold))
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

    signals
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
