package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.VersionedParquet
import graft.text.Curation

/** The runnable daily CORPUS pipeline — the training-data-side
  * sibling of [[DailyEtl]]: fold one day's document batch through the
  * curation funnel ([[Curation.curateFold]]) against the persisted
  * dedup/decontamination state, and commit the extended state, the
  * per-document audit ledger, and the accepted documents through the
  * [[graft.etl.TableFormat]] seam.
  *
  * Usage:
  * {{{
  * sbt "runMain graft.CorpusEtl init   <storeRoot> <evalDocsParquet>"
  * sbt "runMain graft.CorpusEtl run    <storeRoot> <batchParquet> <batchId>"
  * sbt "runMain graft.CorpusEtl forget <storeRoot> <docIdsParquet>"
  * }}}
  *
  * `init` pins the benchmark: the eval set's shingles are committed
  * ONCE and never move, so a day-1 keep decision cannot be
  * invalidated by a day-30 arrival. Each `run` folds a batch of
  * `documents`-schema rows; per-day work is batch-proportional
  * (history is touched only through its 32-byte hash set and its LSH
  * band index — day-1 text is never re-shingled on day 30).
  *
  * Store tables (all through the TableFormat seam):
  *  - `eval_shingles` (shingle) — pinned at init.
  *  - `content_hashes` (content_md5, doc_id) — exact-dedup probe set,
  *    append-per-batch; doc_id addresses rows for [[forget]].
  *  - `band_index` (doc_id, shingles, band_idx, band_hash) — near-dup
  *    probe index, append-per-batch. At warehouse scale this table is
  *    written BUCKETED on (band_idx, band_hash) (BucketingSpec's
  *    layout) so the daily probe join never shuffles the index side.
  *  - `corpus_flags` — the audit ledger: every document ever folded
  *    with its per-stage flags and batch_id (curation decisions are
  *    inspectable, not silently filtered away).
  *  - `corpus_kept` — the accepted documents (the training-set feed).
  *
  * Cross-table atomicity rides [[DailyEtl]]'s manifest pattern: a
  * MANIFEST table committed LAST pins the (table → version) tuple of
  * one consistent daily state; reads go through it; a concurrent
  * second run fails its manifest commit LOUDLY (optimistic
  * concurrency against the version this run's reads were based on)
  * instead of silently losing a day. A crash mid-persist leaves only
  * orphan versions the manifest never points to.
  *
  * Scale note on the commit itself: the versioned-parquet backend
  * rewrites a table per version, so the three append-per-batch tables
  * cost O(history) to commit here; a transactional format fulfils the
  * same seam with an APPEND commit (new files only), which is the
  * production shape — everything above the seam is unchanged.
  */
object CorpusEtl {

  /** Per-batch funnel accounting, printed by [[main]] and returned to
    * callers — the numbers an operator watches day over day. */
  final case class Audit(
      batchId: Long, nIn: Long, nKept: Long, nExactDup: Long,
      nNearDup: Long, nContaminated: Long, nEval: Long, nLowQuality: Long)

  private val stateTables = Seq("content_hashes", "band_index", "eval_shingles")
  private val allTables = stateTables ++ Seq("corpus_flags", "corpus_kept")

  private def emptyFlags(spark: SparkSession, cfg: Curation.Config): DataFrame = {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Curation.curateFold(noDocs, Curation.initState(noDocs, cfg), cfg)._1
      .withColumn("batch_id", lit(0L))
  }

  /** Pin the benchmark and commit the day-0 empty state. */
  def init(spark: SparkSession, storeRoot: String, evalDocs: DataFrame,
      cfg: Curation.Config = Curation.Config()): Unit = {
    import spark.implicits._
    val fmt = new VersionedParquet(spark, storeRoot)
    require(fmt.currentVersion("manifest") == 0,
      s"store at $storeRoot is already initialized")
    val s0 = Curation.initState(evalDocs, cfg)
    fmt.overwrite("eval_shingles", s0.evalShingles)
    fmt.overwrite("content_hashes", s0.hashes)
    fmt.overwrite("band_index", s0.bandIndex)
    fmt.overwrite("corpus_flags", emptyFlags(spark, cfg))
    fmt.overwrite("corpus_kept", evalDocs.limit(0).withColumn("batch_id", lit(0L)))
    commitManifest(spark, fmt, 0L)
  }

  private def commitManifest(spark: SparkSession, fmt: VersionedParquet,
      base: Long): Unit = {
    import spark.implicits._
    val versions = allTables.map(n => (n, fmt.currentVersion(n)))
    fmt.tryCommit("manifest", versions.toDF("table_name", "version"), base)
    ()
  }

  private def loadState(fmt: VersionedParquet)
      : (Curation.FoldState, Long) = {
    val base = fmt.currentVersion("manifest")
    require(base > 0, "store has no manifest — run `CorpusEtl init` first")
    val pinned = fmt.read("manifest").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def tbl(n: String) = fmt.readVersion(n, pinned(n))
    (Curation.FoldState(
      hashes = tbl("content_hashes"),
      bandIndex = tbl("band_index"),
      evalShingles = tbl("eval_shingles")), base)
  }

  /** Fold one batch: gate, dedup against history, decontaminate
    * against the pinned benchmark, commit. First arrival wins — a
    * batch doc duplicating anything already folded is the loser. */
  def runBatch(spark: SparkSession, storeRoot: String, batch: DataFrame,
      batchId: Long, cfg: Curation.Config = Curation.Config()): Audit = {
    val fmt = new VersionedParquet(spark, storeRoot)
    val (state, manifestBase) = loadState(fmt)
    val (flags, next) = Curation.curateFold(batch, state, cfg)

    // the parquet commit IS the between-days checkpoint: it
    // materializes the one shingle/hash pass this fold did, and no
    // in-memory lineage survives a day boundary (PipelineE2ESpec's
    // chained-plan lesson, same as DailyEtl)
    val stamped = flags.withColumn("batch_id", lit(batchId))
    fmt.overwrite("content_hashes", next.hashes)
    fmt.overwrite("band_index", next.bandIndex)
    fmt.overwrite("corpus_flags",
      fmt.read("corpus_flags").unionByName(stamped))
    fmt.overwrite("corpus_kept",
      fmt.read("corpus_kept").unionByName(
        batch.join(stamped.where(col("kept")).select("doc_id"), "doc_id")
          .withColumn("batch_id", lit(batchId))))
    commitManifest(spark, fmt, manifestBase)

    val a = fmt.read("corpus_flags").where(col("batch_id") === batchId)
      .agg(
        count(lit(1)), sum(col("kept").cast("long")),
        sum(col("is_exact_dup").cast("long")),
        sum(col("is_near_dup").cast("long")),
        sum(col("is_contaminated").cast("long")),
        sum(col("is_eval").cast("long")),
        sum((col("quality") < cfg.minQuality).cast("long")))
      .head()
    Audit(batchId, a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3),
      a.getLong(4), a.getLong(5), a.getLong(6))
  }

  /** Point-in-time read: every store table as pinned by `manifestVersion`
    * — "what did the funnel know after day N" for audits and
    * backfills. Committed versions are immutable, so this is safe
    * concurrent with daily runs; note that [[forget]] mints a NEW
    * manifest version rather than editing history, so erasure
    * compliance for the underlying FILES of older versions is the
    * retention policy of the backing format (vacuum old versions),
    * not this read path. */
  def tablesAsOf(spark: SparkSession, storeRoot: String,
      manifestVersion: Long): Map[String, DataFrame] = {
    val fmt = new VersionedParquet(spark, storeRoot)
    val pinned = fmt.readVersion("manifest", manifestVersion).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    allTables.map(n => n -> fmt.readVersion(n, pinned(n))).toMap
  }

  /** Right-to-be-forgotten: erase `docIds` (a (doc_id) frame) from
    * every table that carries the documents — accepted text, audit
    * ledger, content hashes, band-index rows — in one manifest-
    * committed state change, so a crash can't leave a half-forgotten
    * store and a racing daily run fails loudly against the new base.
    *
    * Semantics, deliberately: (1) erasure is by anti-join on doc_id —
    * a surviving exact copy of a forgotten document (different
    * doc_id, same content) keeps ITS hash/band rows, so forgetting
    * one copy never unblocks its other copies; (2) PAST decisions
    * stand — a document that was dropped as a duplicate of a now-
    * forgotten one stays dropped (its ledger row never referenced the
    * winner); (3) FUTURE arrivals of the forgotten content are judged
    * fresh — the probe rows are gone, which is exactly what erasure
    * means. Scale: four anti-joins against a (typically tiny)
    * broadcast forget-set; on the versioned-parquet backend the
    * commit rewrites each table, where a transactional format fulfils
    * the same seam with deletion vectors / merge-on-read. */
  def forget(spark: SparkSession, storeRoot: String,
      docIds: DataFrame): Unit = {
    val fmt = new VersionedParquet(spark, storeRoot)
    val (_, manifestBase) = loadState(fmt)
    val ids = broadcast(docIds.select("doc_id").distinct())
    Seq("content_hashes", "band_index", "corpus_flags", "corpus_kept")
      .foreach { t =>
        fmt.overwrite(t, fmt.read(t).join(ids, Seq("doc_id"), "left_anti"))
      }
    commitManifest(spark, fmt, manifestBase)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toSeq match {
      case Seq("init", storeRoot, evalParquet) =>
        init(spark, storeRoot, spark.read.parquet(evalParquet))
        println(s"[corpus-etl] initialized $storeRoot (benchmark pinned)")
      case Seq("run", storeRoot, batchParquet, batchId) =>
        val a = runBatch(spark, storeRoot,
          spark.read.parquet(batchParquet), batchId.toLong)
        println(s"[corpus-etl] batch ${a.batchId}: in=${a.nIn} kept=${a.nKept} " +
          s"exact_dup=${a.nExactDup} near_dup=${a.nNearDup} " +
          s"contaminated=${a.nContaminated} eval=${a.nEval} " +
          s"low_quality=${a.nLowQuality}")
      case Seq("forget", storeRoot, idsParquet) =>
        forget(spark, storeRoot, spark.read.parquet(idsParquet))
        println(s"[corpus-etl] forgot the docs in $idsParquet from $storeRoot")
      case _ => sys.error(
        "usage: CorpusEtl init <storeRoot> <evalDocsParquet> | " +
          "CorpusEtl run <storeRoot> <batchParquet> <batchId> | " +
          "CorpusEtl forget <storeRoot> <docIdsParquet>")
    }
    spark.stop()
  }
}
