package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** The storage seam under the load layer — the contract a
  * transactional table format (Delta, Iceberg, Hudi) would fulfil.
  *
  * The reference gets atomic `INSERT … ON CONFLICT DO NOTHING
  * RETURNING` from Postgres (`etl_pipeline.py:594-612`); this engine's
  * default backend models each table as a VERSIONED PARQUET directory
  * (SURVEY §7.4 risk 1): immutable version dirs `v=N`, "merge" =
  * [[Load.upsert]]'s anti-join chain + a new version commit, RETURNING
  * computed pre-write. That carries a documented single-writer-per-
  * table assumption — two concurrent merges could both anti-join
  * against `v=N` and race the `v=N+1` commit. A real deployment swaps
  * in a format whose commit protocol arbitrates that race
  * (`MERGE WHEN NOT MATCHED`); everything above this trait is
  * unchanged, which is the point of the seam.
  */
trait TableFormat {

  /** Current committed state. */
  def read(table: String): DataFrame

  /** Point-in-time read of a committed version (audit/backfill). */
  def readVersion(table: String, version: Long): DataFrame

  /** Highest committed version, 0 if the table does not exist. */
  def currentVersion(table: String): Long

  /** Backend commit primitive: persist `df` as version
    * `expectedBase + 1`, FAILING (not clobbering) if any other writer
    * committed after `expectedBase` — each backend supplies its own
    * arbitration (filesystem rename, log CAS, …). Returns the
    * committed version. */
  def tryCommit(table: String, df: DataFrame, expectedBase: Long): Long

  /** Create-or-replace the table with `df` as its next version. */
  def overwrite(table: String, df: DataFrame): Unit =
    tryCommit(table, df, currentVersion(table))

  /** APPEND commit: the next version's logical content is version
    * `ontoVersion`'s content plus `delta`, committed at
    * `expectedBase + 1`. The two version arguments are deliberately
    * separate: `ontoVersion` is the version this writer's READS were
    * pinned to (a manifest-consistent snapshot), `expectedBase` is
    * the arbitration point (normally [[currentVersion]]) — so a
    * writer derives content ONLY from its pinned state while its
    * commit SUPERSEDES any orphan versions a crashed run left behind
    * (orphans are never unioned in; they just become dead versions no
    * manifest references).
    *
    * Default implementation is read-union-rewrite through
    * [[tryCommit]] — correct everywhere but O(history) bytes written
    * per commit. [[ManifestParquet]] overrides it with the
    * transactional-format shape: an O(batch) commit that writes ONLY
    * the delta's files and a new manifest line. */
  def tryAppend(table: String, delta: DataFrame, ontoVersion: Long,
      expectedBase: Long): Long =
    if (ontoVersion <= 0) tryCommit(table, delta, expectedBase)
    else tryCommit(table,
      readVersion(table, ontoVersion).unionByName(delta), expectedBase)

  /** DELETE-by-key commit: the next version's logical content is
    * version `ontoVersion`'s content minus every row whose value in
    * `keys`' single column appears in `keys` — the erasure primitive
    * (right-to-be-forgotten). Version arguments as in [[tryAppend]]:
    * reads pinned to `ontoVersion`, arbitration at `expectedBase`.
    *
    * Default implementation is the read-anti-join-rewrite through
    * [[tryCommit]] — correct everywhere but O(history) bytes written.
    * [[ManifestParquet]] overrides it with a DELETION-VECTOR commit:
    * stage only the key set and append a tombstone entry to the
    * manifest, so erasing k documents from a year of history writes
    * O(k) bytes ([[ManifestParquet.compact]] later materializes the
    * subtraction and drops the tombstone). An empty key set still
    * mints a version — callers that want no-op elision guard before
    * calling. */
  def tryDeleteRows(table: String, keys: DataFrame, ontoVersion: Long,
      expectedBase: Long): Long = {
    val keyCol = TableFormat.deleteKeyCol(keys)
    require(ontoVersion > 0, s"table $table does not exist")
    tryCommit(table,
      readVersion(table, ontoVersion)
        .join(keys.dropDuplicates(keyCol), Seq(keyCol), "left_anti"),
      expectedBase)
  }

  /** `MERGE WHEN NOT MATCHED THEN INSERT` under the table's unique
    * constraints (DDL order), with `priority` as the within-batch
    * tie-break: commits the merged state and returns the inserted
    * (RETURNING) set. A no-op merge (zero survivors) MUST NOT mint a
    * new version.
    *
    * Defined ONCE on the trait: the merge semantics ARE the contract;
    * backends only supply read + arbitrated commit. RETURNING is
    * computed pre-commit against the version the anti-joins saw —
    * committed versions are immutable in every backend, so the lazy
    * frame remains valid after the commit — and the commit supersedes
    * EXACTLY the version read, so a racer's rows can never be
    * silently dropped. */
  final def mergeInsert(
      table: String,
      batch: DataFrame,
      constraints: Seq[Seq[String]],
      priority: Seq[Column]): DataFrame = {
    val base = currentVersion(table)
    require(base > 0, s"table $table does not exist")
    val existing = readVersion(table, base)
    val (inserted0, _) = Load.upsert(existing, batch, constraints, priority)
    // materialize the RETURNING set ONCE: without it the anti-join
    // chain over the full table runs three times (empty guard, the
    // commit's recompute of existing∪inserted, the caller's action on
    // the returned frame). Generation-freed per table — by the next
    // merge the previous RETURNING has been consumed.
    val inserted = graft.operators.CheckpointBlocks.retire(
      s"mergeInsert.$table", inserted0.localCheckpoint(true))
    if (inserted.isEmpty) inserted
    // the merged state IS existing ∪ inserted — commit it as an
    // APPEND of the survivors onto the version the anti-joins saw,
    // so a manifest-log backend pays O(inserted), not O(table)
    else { tryAppend(table, inserted, base, base); inserted }
  }

  /** `MERGE WHEN MATCHED AND target.valueCol IS NULL THEN UPDATE` —
    * the fill-if-null enrich (S10). Returns the updated rows; no-op
    * updates mint no version. */
  final def mergeUpdateIfNull(
      table: String,
      updates: DataFrame,
      key: String,
      valueCol: String): DataFrame = {
    val base = currentVersion(table)
    require(base > 0, s"table $table does not exist")
    val (returning0, newState) =
      Load.updateColumn(readVersion(table, base), updates, key, valueCol)
    // same one-execution discipline as mergeInsert: the fill join
    // otherwise runs for the guard, the commit, and the caller's read
    val returning = graft.operators.CheckpointBlocks.retire(
      s"mergeUpdateIfNull.$table", returning0.localCheckpoint(true))
    if (returning.isEmpty) returning
    else { tryCommit(table, newState, base); returning }
  }
}

object TableFormat {
  /** How a store root resolves to a backend. The default is the
    * manifest-log backend ([[ManifestParquet]]) — O(batch) append
    * commits — for every runnable main; specs swap in the others to
    * prove the pipelines are backend-agnostic above the seam. */
  type Backend = (SparkSession, String) => TableFormat
  val DefaultBackend: Backend = (s, r) => new ManifestParquet(s, r)

  /** The key column of a delete set: its single column, by contract. */
  private[etl] def deleteKeyCol(keys: DataFrame): String = {
    require(keys.schema.fields.length == 1,
      s"a delete key set must have exactly one column, " +
        s"got ${keys.schema.fieldNames.mkString(", ")}")
    keys.schema.fieldNames.head
  }
}

/** What [[Vacuumable.vacuum]] reclaimed. */
final case class VacuumStats(
    dirsDeleted: Long, bytesDeleted: Long, manifestsDeleted: Long)

/** Physical reclamation — the file-backed backends implement it; the
  * in-memory commit log has nothing to reclaim. Vacuum is the OTHER
  * half of erasure: [[TableFormat.tryDeleteRows]] makes forgotten rows
  * unreadable through every retained version, vacuum makes their
  * BYTES leave the disk once the versions that carried them age out
  * of the retention window. */
trait Vacuumable {
  /** Drop every version of `table` below `retainFrom` and physically
    * delete the files only those versions referenced, plus orphan
    * dirs no retained version references (crashed commits, race
    * losers). `olderThanMs` is the in-flight-writer guard: a dir
    * younger than this is never deleted even if unreferenced, because
    * it may be a commit's staged-but-not-yet-published data (the
    * Delta/Iceberg retention-threshold shape). Run with the default 0
    * only when no writer is in flight. */
  def vacuum(table: String, retainFrom: Long, olderThanMs: Long = 0L): VacuumStats
}

/** The default backend: one directory per table holding immutable
  * `v=N` parquet version dirs. Commit protocol: write to a hidden
  * `_tmp` dir, then a filesystem `rename` to `v=N+1` — the rename is
  * the atomic commit point on HDFS-semantics stores (on object stores
  * without atomic rename you want a log-based format; that's what the
  * trait is for). Old versions stay readable (cheap time travel /
  * concurrent readers never see a torn table); retention of old
  * versions is the deployment's vacuum policy, out of scope here.
  */
final class VersionedParquet(spark: SparkSession, root: String)
    extends TableFormat with Vacuumable {

  private def fs =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Delete `v=N` dirs below `retainFrom` plus stale `_tmp_*` staging
    * dirs from crashed commits. Every version dir is self-contained
    * (no sharing across versions), so "referenced by a retained
    * version" is simply N >= retainFrom. */
  override def vacuum(table: String, retainFrom: Long,
      olderThanMs: Long = 0L): VacuumStats = {
    val cur = currentVersion(table)
    require(cur > 0, s"table $table does not exist under $root")
    require(retainFrom >= 1 && retainFrom <= cur,
      s"retainFrom $retainFrom outside committed versions 1..$cur of $table")
    val cutoff = System.currentTimeMillis() - olderThanMs
    var dirs = 0L; var bytes = 0L; var versions = 0L
    for (st <- fs.listStatus(tableDir(table)).toSeq) {
      val name = st.getPath.getName
      val isVersion = name.startsWith("v=")
      val dead =
        if (isVersion) name.stripPrefix("v=").toLong < retainFrom
        else st.getModificationTime <= cutoff // orphan _tmp staging dir
      if (dead) {
        bytes += fs.getContentSummary(st.getPath).getLength
        dirs += 1
        if (isVersion) versions += 1
        fs.delete(st.getPath, true)
      }
    }
    VacuumStats(dirs, bytes, versions)
  }

  private def tableDir(table: String) = new Path(root, table)

  private def versionsOf(table: String): Seq[Long] = {
    val dir = tableDir(table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted
  }

  override def currentVersion(table: String): Long =
    versionsOf(table).lastOption.getOrElse(0L)

  override def read(table: String): DataFrame = {
    val v = currentVersion(table)
    require(v > 0, s"table $table does not exist under $root")
    readVersion(table, v)
  }

  override def readVersion(table: String, version: Long): DataFrame =
    spark.read.parquet(new Path(tableDir(table), s"v=$version").toString)

  /** Optimistic-concurrency commit primitive: writes `df` as version
    * `expectedBase + 1` and FAILS if that version already exists —
    * i.e. if any other writer committed after the version this
    * writer's reads were based on. (On HDFS semantics the rename
    * itself arbitrates; LocalFileSystem renames INTO an existing dir,
    * so the exists-check carries the guard there. The residual TOCTOU
    * window between the two is what [[CommitLogTable]]'s CAS — and a
    * real log-based format's commit protocol — closes.) */
  override def tryCommit(table: String, df: DataFrame, expectedBase: Long): Long = {
    val next = expectedBase + 1
    val tmp = new Path(tableDir(table), s"_tmp_v$next")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dest = new Path(tableDir(table), s"v=$next")
    if (fs.exists(dest) || !fs.rename(tmp, dest))
      throw new IllegalStateException(
        s"commit race on $table v=$next: another writer committed after " +
          s"the base version this merge read (single-writer contract)")
    next
  }

}

/** A second backend proving the seam: an in-memory COMMIT LOG whose
  * versions are eagerly-materialized snapshots and whose commit is a
  * synchronized compare-and-swap on the expected base version — the
  * arbitration shape of a log-based format (Delta/Iceberg), with no
  * rename TOCTOU window at all. Committed versions are
  * `localCheckpoint(true)` snapshots, so pinned readers get the same
  * immutability VersionedParquet gets from immutable `v=N` dirs.
  * Session-lifetime state (no persistence): a test/demo backend whose
  * job is to pass the identical TableFormatSpec contract suite
  * through a different commit protocol. */
final class CommitLogTable(spark: SparkSession) extends TableFormat {

  private val log =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[DataFrame]]()

  private def versions(table: String): Vector[DataFrame] =
    Option(log.get(table)).getOrElse(Vector.empty)

  override def currentVersion(table: String): Long = versions(table).size.toLong

  override def read(table: String): DataFrame = {
    val v = currentVersion(table)
    require(v > 0, s"table $table does not exist in the commit log")
    readVersion(table, v)
  }

  override def readVersion(table: String, version: Long): DataFrame = {
    val vs = versions(table)
    require(version >= 1 && version <= vs.size,
      s"table $table has versions 1..${vs.size}, not $version")
    vs(version.toInt - 1)
  }

  /** CAS commit: the version check and the log append are one atomic
    * step, so a writer whose base was superseded always fails cleanly.
    * (The snapshot materialization runs a Spark job inside the lock —
    * fine for a demo backend; a real log format stages files first
    * and holds the lock only for the log append.) */
  override def tryCommit(table: String, df: DataFrame, expectedBase: Long): Long =
    synchronized {
      val cur = currentVersion(table)
      if (cur != expectedBase)
        throw new IllegalStateException(
          s"commit race on $table: expected base $expectedBase but log is at $cur")
      log.put(table, versions(table) :+ df.localCheckpoint(true))
      expectedBase + 1
    }
}

/** The third backend — the one that makes DAILY APPEND COMMITS
  * O(batch): a table version is a MANIFEST (an immutable text file in
  * `_log/`) listing the immutable data directories whose union is the
  * version's content — the Delta/Iceberg commit shape. An append
  * commit stages ONLY the batch's files and writes a one-more-line
  * manifest; history's files are never rewritten, so the bytes
  * written per daily commit are proportional to the batch, not the
  * corpus (TableFormatSpec asserts it). Overwrites (merge-update,
  * erasure, compaction) still rewrite — that is what they mean;
  * deletion vectors would be the next refinement of THIS backend, not
  * a new seam.
  *
  * Layout per table:
  * {{{
  *   root/<table>/_log/<v>.manifest   line 1 = schema JSON,
  *                                    lines 2.. = ordered entries:
  *                                      d-<nonce>          data dir
  *                                      !<keyCol>:d-<nonce> tombstone
  *   root/<table>/d-<nonce>/          immutable parquet dirs (data,
  *                                    or a tombstone's key set)
  * }}}
  *
  * A TOMBSTONE entry (the deletion-vector shape) subtracts every row
  * whose `keyCol` value appears in its key-set dir from the entries
  * ABOVE it — order matters, so a later append of a previously
  * deleted key is NOT re-deleted (erasure then re-arrival is a
  * first-class sequence for the corpus store). [[tryDeleteRows]]
  * therefore commits O(keys) bytes where the rewrite default commits
  * O(history); [[compact]] materializes the subtraction and drops the
  * tombstones; [[vacuum]] makes the erasure PHYSICAL once the
  * pre-delete versions age out of retention.
  *
  * Commit protocol: stage data dirs first (uniquely named — racing
  * writers can never clobber each other's staged files), then
  * CREATE-EXCLUSIVE the manifest for version N+1 — the exclusive
  * create is the arbitration point, so the loser of a race fails
  * loudly with its staged dir left as an orphan no manifest
  * references (vacuum policy, as with orphan `v=N` dirs in
  * [[VersionedParquet]]). Reads resolve ONLY through manifests, with
  * the manifest's own schema (name-based parquet column resolution —
  * a dir staged with different column ORDER still reads correctly,
  * and an empty version reads as an empty frame without inference). */
final class ManifestParquet(spark: SparkSession, root: String)
    extends TableFormat with Vacuumable {

  import org.apache.spark.sql.types.{DataType, StructType}
  import ManifestParquet.{DataEntry, Entry, TombstoneEntry, parseEntry}

  private def fs =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(table: String) = new Path(root, table)
  private def logDir(table: String) = new Path(tableDir(table), "_log")
  private def manifestPath(table: String, v: Long) =
    new Path(logDir(table), f"$v%020d.manifest")

  override def currentVersion(table: String): Long = {
    val dir = logDir(table)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong)
      .sorted.lastOption.getOrElse(0L)
  }

  override def read(table: String): DataFrame = {
    val v = currentVersion(table)
    require(v > 0, s"table $table does not exist under $root")
    readVersion(table, v)
  }

  private def readManifest(table: String, v: Long): (StructType, Seq[String]) = {
    val in = fs.open(manifestPath(table, v))
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = txt.split("\n", -1).toSeq
    (DataType.fromJson(lines.head).asInstanceOf[StructType],
      lines.tail.filter(_.nonEmpty))
  }

  /** The version's raw manifest entry lines, in commit order —
    * operational introspection (and the specs' receipt that compact
    * dropped the tombstones). */
  def manifestEntries(table: String, version: Long): Seq[String] =
    readManifest(table, version)._2

  override def readVersion(table: String, version: Long): DataFrame = {
    val (schema, lines) = readManifest(table, version)
    def path(d: String) = new Path(tableDir(table), d).toString
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    def scan(dirs: Seq[String]): DataFrame =
      spark.read.schema(schema).parquet(dirs.map(path): _*)
    val entries = lines.map(parseEntry)
    // common case — no tombstones — stays the single multi-path scan
    if (entries.forall(_.isInstanceOf[DataEntry])) {
      if (entries.isEmpty) empty
      else scan(entries.collect { case DataEntry(d) => d })
    } else {
      // ordered fold: a tombstone anti-joins the content ABOVE it, so
      // a later re-append of a deleted key survives. Consecutive data
      // entries collapse into one scan; plan depth = tombstone count
      // (bounded by forget frequency; compact() resets it to zero).
      var acc = empty
      var pending = Vector.empty[String]
      def flush(): Unit =
        if (pending.nonEmpty) {
          acc = if (acc eq empty) scan(pending) else acc.unionByName(scan(pending))
          pending = Vector.empty
        }
      entries.foreach {
        case DataEntry(d) => pending :+= d
        case TombstoneEntry(keyCol, d) =>
          flush()
          val keys = spark.read
            .schema(StructType(Seq(schema(keyCol)).map(_.copy(nullable = true))))
            .parquet(path(d))
          acc = acc.join(keys, Seq(keyCol), "left_anti")
      }
      flush()
      acc
    }
  }

  /** Stage `df` as a new immutable data dir; returns its name. The
    * nonce keeps racing writers' staged files disjoint — arbitration
    * happens at the manifest, never at the data. */
  private def stage(table: String, df: DataFrame): String = {
    val name = s"d-${java.util.UUID.randomUUID().toString.take(13)}"
    df.write.mode(SaveMode.ErrorIfExists)
      .parquet(new Path(tableDir(table), name).toString)
    name
  }

  /** The arbitration point: exclusive-create of the next manifest.
    * A racer that already committed `next` makes the create fail →
    * loud commit race, staged data orphaned, committed state
    * untouched. */
  private def commitManifest(table: String, next: Long, schema: StructType,
      dirs: Seq[String]): Long = {
    fs.mkdirs(logDir(table))
    val p = manifestPath(table, next)
    val out =
      try fs.create(p, false)
      catch {
        case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                  _: java.nio.file.FileAlreadyExistsException |
                  _: java.io.IOException) =>
          throw new IllegalStateException(
            s"commit race on $table v=$next: another writer committed after " +
              s"the base version this writer read", e)
      }
    try out.write((schema.json +: dirs).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    next
  }

  override def tryCommit(table: String, df: DataFrame, expectedBase: Long): Long = {
    val name = stage(table, df)
    commitManifest(table, expectedBase + 1, df.schema, Seq(name))
  }

  /** The O(batch) append: stage the delta's files, then commit a
    * manifest = `ontoVersion`'s dirs + the one new dir. Bytes written
    * ∝ delta; history's files untouched. */
  override def tryAppend(table: String, delta: DataFrame, ontoVersion: Long,
      expectedBase: Long): Long = {
    if (ontoVersion <= 0) tryCommit(table, delta, expectedBase)
    else {
      val (schema, baseDirs) = readManifest(table, ontoVersion)
      // name+type check, nullability-insensitive (catalogString drops
      // containsNull/nullable, which rewrites legitimately flip)
      require(
        delta.schema.fields.map(f => (f.name, f.dataType.catalogString)).sortBy(_._1).toSeq ==
          schema.fields.map(f => (f.name, f.dataType.catalogString)).sortBy(_._1).toSeq,
        s"append to $table: delta schema ${delta.schema.simpleString} does not " +
          s"match table schema ${schema.simpleString}")
      val name = stage(table, delta)
      commitManifest(table, expectedBase + 1, schema, baseDirs :+ name)
    }
  }

  /** The O(keys) erasure: stage the distinct key set as its own dir
    * and commit a manifest = `ontoVersion`'s entries + one tombstone
    * line. Bytes written ∝ keys — erasing k documents from a year of
    * history never rewrites the year ([[compact]] materializes the
    * subtraction later, on maintenance cadence, not on the erasure's
    * critical path). */
  override def tryDeleteRows(table: String, keys: DataFrame,
      ontoVersion: Long, expectedBase: Long): Long = {
    val keyCol = TableFormat.deleteKeyCol(keys)
    require(ontoVersion > 0, s"table $table does not exist under $root")
    val (schema, baseLines) = readManifest(table, ontoVersion)
    require(schema.fieldNames.contains(keyCol),
      s"delete from $table: key column $keyCol is not in the table " +
        s"schema ${schema.fieldNames.mkString(", ")}")
    require(
      keys.schema.head.dataType.catalogString == schema(keyCol).dataType.catalogString,
      s"delete from $table: key column $keyCol is " +
        s"${keys.schema.head.dataType.catalogString} but the table's is " +
        s"${schema(keyCol).dataType.catalogString}")
    val name = stage(table, keys.dropDuplicates(keyCol))
    commitManifest(table, expectedBase + 1, schema,
      baseLines :+ s"!$keyCol:$name")
  }

  /** Small-file maintenance (the flip side of O(batch) appends: a
    * year of daily commits is 365 data dirs): rewrite the current
    * content as ONE staged dir and commit a one-dir manifest.
    * Concurrent pinned readers are untouched — their manifests still
    * reference the old dirs. Also the tombstone materializer: the
    * rewrite applies every deletion vector, so the compacted manifest
    * carries no tombstone entries and read plans are one scan again. */
  def compact(table: String): Long = {
    val base = currentVersion(table)
    require(base > 0, s"table $table does not exist under $root")
    tryCommit(table, readVersion(table, base), base)
  }

  /** Drop manifests below `retainFrom` and physically delete every
    * dir (data or tombstone key set) referenced ONLY by them, plus
    * unreferenced orphans older than `olderThanMs` (crashed commits'
    * staged dirs — the age gate keeps an in-flight commit's
    * staged-but-unpublished dir safe). This is what turns a logical
    * erasure physical: after the pre-delete manifests age out and
    * compact() has materialized the subtraction, no retained manifest
    * references the forgotten rows' files, and vacuum removes the
    * bytes (CorpusEtlSpec's erasure receipt). */
  override def vacuum(table: String, retainFrom: Long,
      olderThanMs: Long = 0L): VacuumStats = {
    val cur = currentVersion(table)
    require(cur > 0, s"table $table does not exist under $root")
    require(retainFrom >= 1 && retainFrom <= cur,
      s"retainFrom $retainFrom outside committed versions 1..$cur of $table")
    val versions = fs.listStatus(logDir(table)).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong)
    val (drop, keep) = versions.partition(_ < retainFrom)
    val referenced: Set[String] = keep.flatMap(v =>
      readManifest(table, v)._2.map(l => parseEntry(l).dir)).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    var dirs = 0L; var bytes = 0L
    for (st <- fs.listStatus(tableDir(table)).toSeq
         if st.getPath.getName != "_log"
         if !referenced.contains(st.getPath.getName)
         if st.getModificationTime <= cutoff) {
      bytes += fs.getContentSummary(st.getPath).getLength
      dirs += 1
      fs.delete(st.getPath, true)
    }
    drop.foreach(v => fs.delete(manifestPath(table, v), false))
    VacuumStats(dirs, bytes, drop.size.toLong)
  }
}

object ManifestParquet {
  /** One manifest line, parsed. Tombstones are `!<keyCol>:<dir>`;
    * anything else is a data dir (dir nonces never contain `!` or
    * `:`, and pre-tombstone manifests parse unchanged). */
  sealed trait Entry { def dir: String }
  final case class DataEntry(dir: String) extends Entry
  final case class TombstoneEntry(keyCol: String, dir: String) extends Entry

  private[etl] def parseEntry(line: String): Entry =
    if (line.startsWith("!")) {
      val sep = line.indexOf(':')
      require(sep > 1, s"malformed tombstone manifest entry: $line")
      TombstoneEntry(line.substring(1, sep), line.substring(sep + 1))
    } else DataEntry(line)
}
