package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.etl.{ManifestParquet, ManifestStore}

/** Structured Streaming SOURCE over a manifest-store table — the
  * store is not just a sink: downstream consumers SUBSCRIBE to the
  * curated corpus (`spark.readStream.format("graft-store")
  * .option("path", root).option("table", "corpus_kept").load()`) and
  * receive each day's accepted documents as a micro-batch, the
  * Delta-streaming-source shape.
  *
  * Semantics:
  *  - OFFSETS ARE MANIFEST VERSIONS, not table versions: a crashed
  *    run's orphan table versions are as invisible to the stream as
  *    they are to batch readers, and a micro-batch is the diff of two
  *    manifest-PINNED states ([[graft.etl.ManifestParquet
  *    .changesBetween]] — CDC from commit shape, no data diffing).
  *  - The FIRST batch is the current pinned snapshot (Delta's
  *    initial-snapshot convention), so a consumer starting late sees
  *    the whole corpus once, then the daily tail.
  *  - Compaction / clustered compaction commits are dataChange=false
  *    → an empty micro-batch; maintenance never re-feeds history.
  *  - ERASURE in range fails the stream LOUDLY by default: an
  *    append-mode stream cannot retract, and silently skipping a
  *    forget would leave forgotten documents live downstream. Set
  *    `ignoreDeletes=true` only when erasure is propagated
  *    out-of-band (the [[graft.CorpusEtl]] `export` CDC feed carries
  *    the deleted keys).
  *  - Replay-deterministic: committed manifests are immutable, so a
  *    restarted query re-planning a recorded offset range
  *    reconstructs byte-identical batches (exactly-once with an
  *    idempotent sink). Keep the offset-log retention inside the
  *    store's vacuum horizon — vacuuming past an un-consumed range
  *    fails the read rather than fabricating it.
  *
  * 100-TB shape: getBatch plans only the NEW dirs' files (O(day), the
  * same property as the batch CDC path); nothing is collected to the
  * driver — the returned frame wraps the pruned scan's physical plan.
  */
final class ManifestStreamSource(
    sqlContext: SQLContext, root: String, table: String,
    ignoreDeletes: Boolean) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession
  private def fmt = new ManifestParquet(spark, root)
  private val manifest = ManifestStore.Manifest

  /** The (table → version) pin recorded by manifest version `v` —
    * resolved through [[ManifestStore.pinned]], the one place that
    * knows the manifest table's layout. */
  private def pinnedVersion(f: ManifestParquet, manifestV: Long): Long =
    new ManifestStore(spark, f, Seq(table)).pinned(manifestV)
      .getOrElse(table, throw new IllegalArgumentException(
        s"manifest $manifestV of $root does not pin table $table"))

  override val schema: StructType = {
    val f = fmt
    val base = f.currentVersion(manifest)
    require(base > 0, s"store at $root has no committed manifest")
    f.readVersion(table, pinnedVersion(f, base)).schema
  }

  override def getOffset: Option[Offset] = {
    val v = fmt.currentVersion(manifest)
    if (v <= 0) None else Some(LongOffset(v))
  }

  // LongOffset.json is the plain decimal, and a restarted query hands
  // back SerializedOffset with the same json — one decode for both
  private def versionOf(o: Offset): Long = o.json.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val f = fmt
    val to = versionOf(end)
    val pTo = pinnedVersion(f, to)
    val batch = start.map(versionOf) match {
      case None =>
        // initial batch = the pinned snapshot as of `end`
        f.readVersion(table, pTo)
      case Some(from) =>
        val pFrom = pinnedVersion(f, from)
        val ch = f.changesBetween(table, pFrom, pTo)
        if (!ignoreDeletes && ch.deletedKeys.nonEmpty)
          throw new IllegalStateException(
            s"table $table saw deletes in manifest range ($from, $to] — an " +
              "append-mode stream cannot retract. Propagate erasure " +
              "downstream (CorpusEtl export carries the deleted keys) and " +
              "set ignoreDeletes=true to acknowledge.")
        ch.appended
    }
    // additive evolution widens the table under a running query; the
    // stream's schema is fixed at start, so fail with the actionable
    // message instead of a plan-binding error deep in the engine
    require(batch.schema.fieldNames.sameElements(schema.fieldNames),
      s"table $table evolved from ${schema.simpleString} to " +
        s"${batch.schema.simpleString} mid-stream — restart the query to " +
        "pick up the new schema")
    // MicroBatchExecution requires an isStreaming=true frame; wrap the
    // batch plan's physical RDD — lazy, distributed, no driver detour
    org.apache.spark.sql.graft.StreamingFrameBridge.asStreaming(batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"ManifestStreamSource[$root/$table]"
}

/** `format("graft-store")` registration (META-INF/services) — V1
  * StreamSourceProvider, the same API Spark's own FileStreamSource
  * rides. Options: `path` (store root), `table`, `ignoreDeletes`. */
final class ManifestStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-store"

  private def opts(parameters: Map[String, String]): (String, String, Boolean) = (
    parameters.getOrElse("path", sys.error(
      "graft-store requires option 'path' (the store root)")),
    parameters.getOrElse("table", sys.error(
      "graft-store requires option 'table'")),
    parameters.get("ignoreDeletes").exists(_.toBoolean))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val (root, table, ig) = opts(parameters)
    (shortName(), schema.getOrElse(
      new ManifestStreamSource(sqlContext, root, table, ig).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (root, table, ig) = opts(parameters)
    new ManifestStreamSource(sqlContext, root, table, ig)
  }
}
