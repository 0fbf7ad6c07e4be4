package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.MusicCsv.keepBestRow
import graft.model.Music.MusicDb

/** The load layer: every `INSERT … ON CONFLICT DO NOTHING RETURNING`
  * of the reference (S9, `etl_pipeline.py:594-612,699-728,768-786,
  * 824-851`) re-expressed set-based (SURVEY.md §2.3 J7, §7.4 risks
  * 1-2).
  *
  * Semantics of `ON CONFLICT DO NOTHING` on an immutable store:
  *   1. dedup WITHIN the batch per unique constraint (first-in-order
  *      wins — Spark has no row order, so the caller supplies an
  *      explicit priority order);
  *   2. LEFT ANTI join against the existing table per unique
  *      constraint, in constraint order (a row can pass the PK check
  *      and still violate a later unique key);
  *   3. the surviving set IS the `RETURNING` result — computed before
  *      the append, then unioned in.
  *
  * Scale: each anti-join shuffles on the constraint key OR broadcasts
  * the batch side; daily batches are tiny (10 rows in the reference),
  * so Catalyst broadcasts them and the "upsert" costs one pass over
  * the existing table per constraint. With a sorted/bucketed store
  * these collapse further; with a transactional table format this
  * whole object is `MERGE WHEN NOT MATCHED`.
  */
object Load {

  /** One `ON CONFLICT DO NOTHING` upsert.
    *
    * @param constraints the table's unique constraints, in DDL order;
    *                    each is the column list of one constraint.
    *                    NULL keys never conflict (SQL UNIQUE), which
    *                    left_anti's null-rejecting equi-join gives for
    *                    free.
    * @param priority    within-batch tie-break (the reference's insert
    *                    order), e.g. the ingestion `position` column.
    * @return (inserted rows — the RETURNING set, new table state)
    */
  def upsert(
      existing: DataFrame,
      batch: DataFrame,
      constraints: Seq[Seq[String]],
      priority: Seq[Column]): (DataFrame, DataFrame) = {
    val cols = existing.columns.map(col).toSeq
    // dedup while the priority columns (e.g. ingestion position) are
    // still present, THEN project to the table's schema.
    // SQL UNIQUE never treats NULL keys as conflicting, so rows with
    // any NULL key column bypass the dedup window (a partitionBy on
    // them would wrongly collapse all NULL-keyed rows into one).
    val deduped = constraints.foldLeft(batch) { (b, keys) =>
      val anyNull = keys.map(col(_).isNull).reduce(_ || _)
      keepBestRow(b.where(!anyNull), keys, priority)
        .unionByName(b.where(anyNull))
    }.select(cols: _*)
    val inserted = constraints.foldLeft(deduped) { (b, keys) =>
      b.join(existing, keys, "left_anti")
    }.select(cols: _*) // USING anti-joins move key columns first — restore DDL order
    (inserted, existing.unionByName(inserted))
  }

  /** S10 `UPDATE song_tb SET apple_music_url=$1 WHERE isrc=$2
    * RETURNING *` (reference `etl_pipeline.py:663-697`), set-based:
    * one join + coalesce instead of a row-at-a-time loop. Only rows
    * whose url was NULL get updated (the reference selects candidates
    * with `apple_music_url IS NULL`, P2).
    *
    * @param updates columns (isrc, apple_music_url)
    * @return (updated rows — RETURNING set, new song table)
    */
  def updateAppleMusicUrls(song: DataFrame, updates: DataFrame): (DataFrame, DataFrame) =
    updateColumn(song, updates, "isrc", "apple_music_url")

  /** General fill-if-NULL column update (the set-based S10): rows of
    * `base` whose `valueCol` is NULL take the update's value; non-NULL
    * rows are never overwritten (the reference selects candidates with
    * `… IS NULL`, P2). Returns (RETURNING set, new state).
    *
    * UNIQUE(valueCol) safety (the reference declares the filled
    * column UNIQUE, `create_schema_structure.sql`): a fill value that
    * already exists on ANY base row, or that more than one key would
    * take, would corrupt the uniqueness the reference's UPDATE
    * enforces by raising — a distributed batch can't abort halfway,
    * so such updates are SKIPPED instead (the engine-wide
    * conflict-skip discipline `upsert` applies to inserts; documented
    * deviation: skip-and-continue where the reference would error). */
  def updateColumn(base: DataFrame, updates: DataFrame, key: String, valueCol: String): (DataFrame, DataFrame) = {
    val u = updates.select(col(key), col(valueCol).as("__new_val"))
      .where(col("__new_val").isNotNull)
      .transform(keepBestRow(_, Seq(key), Seq(col("__new_val").asc)))
      // value already present anywhere in base → skip (anti-join on
      // the value column); two keys drawing the same value → lowest
      // key wins, the other skips
      .join(base.select(col(valueCol).as("__new_val"))
        .where(col("__new_val").isNotNull), Seq("__new_val"), "left_anti")
      .transform(keepBestRow(_, Seq("__new_val"), Seq(col(key).asc)))
    val joined = base.join(u, Seq(key), "left")
    val applied = joined
      .withColumn("__hit", col(valueCol).isNull && col("__new_val").isNotNull)
      .withColumn(valueCol,
        when(col("__hit"), col("__new_val")).otherwise(col(valueCol)))
    val newBase = applied.select(base.columns.map(col).toSeq: _*)
    val returning = applied.where(col("__hit")).select(base.columns.map(col).toSeq: _*)
    (returning, newBase)
  }

  /** Result of one daily batch load: the new state plus the four
    * insert RETURNING sets (what the reference appends to its CSVs,
    * S11) and the S10 fill RETURNING set (`updatedSongs` — songs
    * already present that gained an apple_music_url this batch; also
    * how [[graft.DailyEtl]] knows a day is NOT pure-append and must
    * commit the song table as a rewrite). */
  final case class LoadResult(
      db: MusicDb,
      insertedArtists: DataFrame,
      insertedSongs: DataFrame,
      updatedSongs: DataFrame,
      insertedMaps: DataFrame,
      insertedRankings: DataFrame)

  /** Full daily load (reference `main()` stages 1-2,
    * `etl_pipeline.py:1003-1022`): dims first, then bridge + fact —
    * the FK dependency barrier becomes plain sequential job ordering.
    *
    * @param docs normalized song docs with (source, position) carried
    *             explicitly from ingestion (see [[Normalize]]).
    * @param today the ranking-date stamp (injected, never
    *              `current_date()` inside the plan — testability +
    *              reproducible backfills).
    */
  def loadBatch(db: MusicDb, docs: DataFrame, today: java.sql.Date): LoadResult = {
    val pos = Seq(col("source").asc, col("position").asc)

    val artists = Normalize.artists(docs)
    val (insArtist, newArtist) =
      upsert(db.artist, artists, Seq(Seq("artist_id")), Seq(col("artist_name").asc))

    // keep (source, position) through the within-batch dedup; upsert
    // projects to the table schema only after ordering by them
    val songs = docs.select(
      (db.song.columns.map(col) ++ Seq(col("source"), col("position"))).toSeq: _*)
    val (insSong, newSong0) = upsert(
      db.song, songs,
      Seq(Seq("isrc"), Seq("spotify_url"), Seq("apple_music_url")),
      pos)
    // songs already present keep their row but may gain an
    // apple_music_url they lacked (S10 enrich path)
    val (updSong, newSong) = updateAppleMusicUrls(
      newSong0, docs.select(col("isrc"), col("apple_music_url")))

    val maps = Normalize.artistSongMaps(docs)
    val (insMap, newMap) =
      upsert(db.artistSongMap, maps, Seq(Seq("artist_id", "isrc")), Seq(col("artist_id").asc))

    val rankings = Normalize.rankings(docs, today)
    // rank is 1:1 with position within each source, so (source, rank)
    // reproduces the reference's insert order without re-carrying the
    // ingestion columns through the W2 window
    val (insRank, newRank) = upsert(
      db.ranking, rankings,
      Seq(Seq("isrc", "ranking_date", "ranking_source"),
        Seq("ranking_date", "rank", "ranking_source")),
      Seq(col("ranking_source").asc, col("rank").asc))

    // AFTER INSERT retention trigger X5 fires on the fact table
    val retained = Maintenance.retention(
      MusicDb(newArtist, newSong, newMap, newRank), today)

    LoadResult(retained, insArtist, insSong, updSong, insMap, insRank)
  }

  /** S11 CSV append sink: quoted values, NULL = empty unquoted field,
    * ISO dates — matching the reference's CSV conventions
    * (`etl_pipeline.py:732-742`). Spark appends part-files, not lines;
    * same semantics, scalable layout. */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write
      .mode("append")
      .option("quoteAll", "true")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)
}
