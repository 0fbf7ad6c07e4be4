package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.VersionedParquet
import graft.text.Curation

/** The store-backed daily corpus fold: batch-by-batch [[CorpusEtl]]
  * over a temp store must reproduce the one-shot [[Curation.curate]]
  * verdicts bit-for-bit (ascending-id batches, benchmark pinned from
  * the full corpus's eval slice — the `q_curate_incremental`
  * equivalence, driven through the real manifest/commit path), and
  * the manifest must make racing runs loud. */
class CorpusEtlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_corpus_etl").toString

  private val docs: DataFrame =
    graft.io.Tables.table(spark, "/root/testdata/sf0.001", "documents")

  private def flagRows(df: DataFrame) = df
    .select("doc_id", "n_tokens", "quality", "predicted", "is_eval",
      "is_exact_dup", "is_near_dup", "is_contaminated", "sampled_in", "kept")
    .orderBy("doc_id").collect().toSeq

  test("two-day fold over the store == one-shot curate over the union") {
    val root = freshRoot()
    val cfg = Curation.Config()
    val mid = docs.agg(max($"doc_id")).head().getLong(0) / 2
    CorpusEtl.init(spark, root,
      docs.where($"doc_id" % cfg.evalModulus === 0), cfg)
    val a1 = CorpusEtl.runBatch(spark, root, docs.where($"doc_id" <= mid), 1L, cfg)
    val a2 = CorpusEtl.runBatch(spark, root, docs.where($"doc_id" > mid), 2L, cfg)

    val fmt = new VersionedParquet(spark, root)
    val ledger = fmt.read("corpus_flags")
    assert(flagRows(ledger) == flagRows(Curation.curate(docs, cfg)))

    // the audit is the ledger's arithmetic
    assert(a1.nIn + a2.nIn == docs.count())
    assert(a1.nKept + a2.nKept ==
      ledger.where($"kept").count())

    // the kept table is exactly the ledger's kept set, text attached
    val kept = fmt.read("corpus_kept")
    assert(kept.select("doc_id").orderBy("doc_id").as[Long].collect().toSeq ==
      ledger.where($"kept").orderBy("doc_id").select("doc_id").as[Long].collect().toSeq)
  }

  test("cross-batch duplicates are caught through the committed state") {
    val root = freshRoot()
    val cfg = Curation.Config()
    val base = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today", "en", "web", 60L),
      (11L, "an entirely different document about music charts and rankings here", "en", "web", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // batch 2: 20 = exact copy of 10; 21 = near copy of 11; 22 = fresh
    val day2 = Seq(
      (20L, "the quick brown fox jumps over the lazy dog again and again today", "en", "web", 60L),
      (21L, "an entirely different document about music charts and rankings there", "en", "web", 60L),
      (22L, "completely unrelated content with many unique words in this row", "en", "web", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusEtl.init(spark, root, base.limit(0), cfg)
    CorpusEtl.runBatch(spark, root, base, 1L, cfg)
    val a2 = CorpusEtl.runBatch(spark, root, day2, 2L, cfg)
    assert(a2.nExactDup == 1L && a2.nNearDup >= 1L)
    val fmt = new VersionedParquet(spark, root)
    val f = fmt.read("corpus_flags").where($"batch_id" === 2L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(f(20L).getAs[Boolean]("is_exact_dup"))
    assert(f(21L).getAs[Boolean]("is_near_dup"))
    assert(!f(22L).getAs[Boolean]("is_exact_dup") &&
      !f(22L).getAs[Boolean]("is_near_dup"))
  }

  test("forget erases a document everywhere and its content is judged fresh") {
    val root = freshRoot()
    val cfg = Curation.Config()
    val day1 = Seq(
      (10L, "remember me not this very distinctive document text right here", "en", "web", 60L),
      (11L, "an entirely different document about music charts and rankings here", "en", "web", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusEtl.init(spark, root, day1.limit(0), cfg)
    CorpusEtl.runBatch(spark, root, day1, 1L, cfg)
    CorpusEtl.forget(spark, root, Seq(10L).toDF("doc_id"))

    val fmt = new VersionedParquet(spark, root)
    for (t <- Seq("content_hashes", "band_index", "corpus_flags", "corpus_kept"))
      assert(fmt.read(t).where($"doc_id" === 10L).isEmpty, s"doc 10 survives in $t")
    assert(fmt.read("corpus_flags").where($"doc_id" === 11L).count() == 1)

    // the forgotten content no longer blocks a future arrival; the
    // untouched doc 11 still does
    val day2 = Seq(
      (20L, "remember me not this very distinctive document text right here", "en", "web", 60L),
      (21L, "an entirely different document about music charts and rankings there", "en", "web", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusEtl.runBatch(spark, root, day2, 2L, cfg)
    val f = fmt.read("corpus_flags").where($"batch_id" === 2L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!f(20L).getAs[Boolean]("is_exact_dup") &&
      !f(20L).getAs[Boolean]("is_near_dup"))
    assert(f(21L).getAs[Boolean]("is_near_dup"))
  }

  test("forgetting one copy never unblocks its surviving exact copies") {
    val root = freshRoot()
    val cfg = Curation.Config()
    val textX = "the same duplicated content appears in two separate documents today"
    val day1 = Seq(
      (30L, textX, "en", "web", 60L), (31L, textX, "en", "web", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    CorpusEtl.init(spark, root, day1.limit(0), cfg)
    CorpusEtl.runBatch(spark, root, day1, 1L, cfg)
    CorpusEtl.forget(spark, root, Seq(30L).toDF("doc_id"))
    CorpusEtl.runBatch(spark, root,
      Seq((40L, textX, "en", "web", 60L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), 2L, cfg)
    val fmt = new VersionedParquet(spark, root)
    val f40 = fmt.read("corpus_flags").where($"doc_id" === 40L).head()
    assert(f40.getAs[Boolean]("is_exact_dup"),
      "doc 31's surviving probe row must still block new copies")

    // time travel: the day-1 state (manifest v2 — init was v1) still
    // shows doc 30's ledger row; the current state does not
    val asOfDay1 = CorpusEtl.tablesAsOf(spark, root, 2L)
    assert(asOfDay1("corpus_flags").where($"doc_id" === 30L).count() == 1)
    assert(fmt.read("corpus_flags").where($"doc_id" === 30L).isEmpty)
  }

  test("init refuses a live store; a racing day fails its manifest commit") {
    val root = freshRoot()
    val cfg = Curation.Config()
    CorpusEtl.init(spark, root, docs.limit(0), cfg)
    intercept[IllegalArgumentException] {
      CorpusEtl.init(spark, root, docs.limit(0), cfg)
    }
    // simulate the loser of a double-fired day: bump the manifest
    // under a run's feet, then its commit (against the stale base)
    // must fail loudly rather than silently overwrite
    val fmt = new VersionedParquet(spark, root)
    val stale = fmt.currentVersion("manifest")
    fmt.tryCommit("manifest", fmt.read("manifest"), stale)
    intercept[Exception] {
      fmt.tryCommit("manifest", fmt.read("manifest"), stale)
    }
  }
}
