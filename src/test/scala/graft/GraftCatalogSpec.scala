package graft

/** The runtime SQL front door: tables + native functions registered
  * on an existing session make a pure-SQL dedup pipeline work
  * end-to-end with no DataFrame code. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("pure SQL exact-dedup pipeline over registered views and kernels") {
    GraftCatalog.register(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT md5(text) AS h, min(doc_id) AS canonical, count(*) AS copies
        |  FROM documents GROUP BY md5(text) HAVING count(*) > 1)""".stripMargin)
      .as[Long].head()
    val viaApi = graft.text.TextOps.exactDupGroups(
      graft.io.Tables.table(spark, "/root/testdata/sf0.001", "documents"))
      .where($"n_copies" > 1).count()
    assert(viaSql == viaApi)
  }

  test("registerCorpusStore: the corpus store is plain SQL, with time travel by manifest version") {
    val root = java.nio.file.Files.createTempDirectory("graft_cat_store").toString
    val cfg = graft.text.Curation.Config()
    val docs = graft.io.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val mid = docs.agg(org.apache.spark.sql.functions.max($"doc_id")).head().getLong(0) / 2
    CorpusEtl.init(spark, root, docs.where($"doc_id" % cfg.evalModulus === 0), cfg)
    CorpusEtl.runBatch(spark, root, docs.where($"doc_id" <= mid), 1L, cfg)
    val dayOneManifest = 2L // init = 1, batch 1 = 2
    CorpusEtl.runBatch(spark, root, docs.where($"doc_id" > mid), 2L, cfg)

    GraftCatalog.registerCorpusStore(spark, root)
    val ledgerDays = spark.sql(
      "SELECT batch_id, count(*) AS n FROM corpus_corpus_flags " +
        "WHERE batch_id > 0 GROUP BY batch_id ORDER BY batch_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ledgerDays.map(_._1) == Seq(1L, 2L))
    assert(ledgerDays.map(_._2).sum == docs.count())

    // time travel: as of the day-1 manifest, day 2 does not exist
    GraftCatalog.registerCorpusStore(spark, root, asOfManifest = Some(dayOneManifest))
    assert(spark.sql(
      "SELECT count(*) FROM corpus_corpus_flags WHERE batch_id = 2")
      .as[Long].head() == 0L)
    assert(spark.sql(
      "SELECT count(*) FROM corpus_corpus_kept").as[Long].head() > 0L)
  }

  test("registerMusic exposes the reference views from the seed CSVs") {
    GraftCatalog.registerMusic(spark, "/root/reference/db/csv")
    val n = spark.sql("SELECT count(*) FROM all_rankings_view").as[Long].head()
    assert(n > 0)
  }

  test("native kernels callable from SQL after runtime registration") {
    GraftCatalog.register(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT graft_intersect_size(
        |         graft_shingles(split(a.text, ' '), 3),
        |         graft_shingles(split(b.text, ' '), 3)) AS common
        |FROM documents a JOIN documents b ON a.doc_id = 0 AND b.doc_id = 1""".stripMargin)
      .as[Long].head()
    assert(n >= 0)
    val sims = spark.sql(
      "SELECT graft_simhash(split(text, ' '), 3) FROM documents LIMIT 3")
      .as[String].collect()
    assert(sims.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
  }
}
