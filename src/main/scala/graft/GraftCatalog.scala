package graft

import org.apache.spark.sql.SparkSession

import graft.io.Tables

/** Runtime SQL front door: make an EXISTING session fully SQL-usable
  * — every testdata table as a temp view plus every native `graft_*`
  * function in the registry ([[register]]), and separately the
  * reference's music views under their reference names from a seed
  * CSV dir ([[registerMusic]]).
  *
  * The session-build path (`spark.sql.extensions =
  * graft.functions.GraftExtensions`) is preferred in production — it
  * also installs the planner strategy and the top-k rewrite rule —
  * but notebooks and services that receive a session they didn't
  * build need this runtime form (the custom-plan machinery is still
  * installed lazily by [[Tables.table]]).
  */
object GraftCatalog {

  /** Register all parquet tables of `dir` as temp views plus the
    * native function surface. Idempotent. */
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir)
    registerFunctions(spark)
  }

  /** Load the music seed CSVs and expose the reference's SQL views
    * (`all_rankings_view` etc.) under their reference names. */
  def registerMusic(spark: SparkSession, seedDir: String): Unit =
    graft.query.Views.register(graft.io.MusicCsv.loadSeedDir(spark, seedDir))

  /** Just the `graft_*` functions (same list the build-time extension
    * injects). Idempotent — re-registration overwrites in place. */
  def registerFunctions(spark: SparkSession): Unit =
    graft.functions.GraftFunctions.all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** SQL over a [[graft.etl.ManifestStore]]-backed store ([[DailyEtl]]
    * / [[CorpusEtl]] roots): every store table as a temp view
    * `<prefix>_<table>`, pinned to ONE consistent manifest state —
    * the latest by default, or `asOfManifest` for time travel
    * ("what did the funnel know after day N" as plain SQL). Views
    * are snapshot-stable by the backends' version immutability: a
    * daily run committing underneath never tears a registered
    * analysis session. Idempotent; re-register to advance. */
  def registerStore(spark: SparkSession, storeRoot: String,
      tables: Seq[String], prefix: String = "store",
      asOfManifest: Option[Long] = None,
      backend: graft.etl.TableFormat.Backend =
        graft.etl.TableFormat.DefaultBackend): Unit = {
    val store = new graft.etl.ManifestStore(spark, backend(spark, storeRoot), tables)
    require(store.base > 0, "store has no manifest — run `CorpusEtl init` first")
    val v = asOfManifest.getOrElse(store.base)
    store.tablesAsOf(v).foreach { case (t, df) =>
      df.createOrReplaceTempView(s"${prefix}_$t")
    }
    registerFunctions(spark)
  }

  /** [[registerStore]] for a [[CorpusEtl]] root's table set (the one
    * list CorpusEtl pins — a table added there registers here too). */
  def registerCorpusStore(spark: SparkSession, storeRoot: String,
      asOfManifest: Option[Long] = None): Unit =
    registerStore(spark, storeRoot, CorpusEtl.allTables,
      prefix = "corpus", asOfManifest = asOfManifest)
}
