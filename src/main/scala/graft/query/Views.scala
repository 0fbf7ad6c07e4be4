package graft.query

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Music.MusicDb

/** The reference's analytics surface: `get_formatted_song_info_fn`,
  * the three views, and the rank-delta table function
  * (reference `db/sql/create_schema_behavior.sql:15-156`;
  * SURVEY.md §2.10 X1/X2, §2.11).
  *
  * Spark-first redesign of X1: the reference calls a per-row PL/pgSQL
  * function (a correlated join+agg PER ROW of every view). Here
  * `songInfo` is computed ONCE as a DataFrame and broadcast-joined into
  * the views — one small shuffle instead of N subqueries; at 100 TB the
  * fact side streams through a broadcast hash join untouched.
  */
object Views {

  /** X1: `isrc → "artist1, artist2 - Song Name"`.
    *
    * `STRING_AGG(artist_name, ', ' ORDER BY artist_name)` decomposes
    * exactly to array_join∘array_sort∘collect_list because the sort key
    * is the aggregated value itself (SURVEY.md §2.4 A1). `concat` (not
    * concat_ws) reproduces `||` NULL-propagation: a song with no
    * artists renders NULL, exactly like the reference fn.
    */
  def songInfo(db: MusicDb): DataFrame = {
    val names = db.artistSongMap
      .join(db.artist, "artist_id")
      .groupBy("isrc")
      .agg(array_join(array_sort(collect_list(col("artist_name"))), ", ").as("artist_names"))
    db.song
      .join(names, Seq("isrc"), "left")
      .select(
        col("isrc"),
        concat(col("artist_names"), lit(" - "), col("song_name")).as("song"),
        col("spotify_url"),
        col("apple_music_url"))
  }

  private def withSong(db: MusicDb): DataFrame =
    db.ranking.join(broadcast(songInfo(db)), Seq("isrc"), "left")

  /** `ranking_source` is a Postgres ENUM that sorts in DECLARATION
    * order — 'Spotify' before 'Apple Music' (structure.sql:16). A
    * plain string sort would invert that, so view sorts key on the
    * enum position (this ordering is what makes the reference
    * renderer's "first 10 rows are Spotify" positional split valid). */
  private[graft] def sourceEnumOrder(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === "Spotify", 0).when(c === "Apple Music", 1).otherwise(2)

  private val viewOrder =
    Seq(col("date").desc, sourceEnumOrder(col("platform")).asc, col("rank").asc)

  /** `all_rankings_view` (behavior.sql:96-108). */
  def allRankings(db: MusicDb): DataFrame =
    withSong(db)
      .select(
        col("ranking_date").as("date"),
        col("ranking_source").as("platform"),
        col("rank"),
        col("song"))
      .orderBy(viewOrder: _*)

  /** `all_rankings_with_urls_view` (behavior.sql:110-126): + J3 left
    * join urls. */
  def allRankingsWithUrls(db: MusicDb): DataFrame =
    withSong(db)
      .select(
        col("ranking_date").as("date"),
        col("ranking_source").as("platform"),
        col("rank"),
        col("song"),
        col("spotify_url"),
        col("apple_music_url"))
      .orderBy(viewOrder: _*)

  /** `all_rankings_with_delta_view` (behavior.sql:128-156) — W1
    * flagship: delta = lag(rank) - rank, gated to consecutive days
    * (gap or first appearance ⇒ NULL ⇒ rendered "new"). Partition by
    * (platform, isrc); LAG needs only the default running frame.
    */
  def allRankingsWithDelta(db: MusicDb): DataFrame = {
    val series = Window
      .partitionBy("ranking_source", "isrc")
      .orderBy(col("ranking_date").asc)
    withSong(db)
      .withColumn(
        "delta",
        when(
          col("ranking_date") === date_add(lag(col("ranking_date"), 1).over(series), 1),
          lag(col("rank"), 1).over(series) - col("rank")))
      .select(
        col("ranking_date").as("date"),
        col("ranking_source").as("platform"),
        col("rank"),
        col("song"),
        col("spotify_url"),
        col("apple_music_url"),
        col("delta"))
      .orderBy(viewOrder: _*)
  }

  /** Registers the three views under the reference's SQL names, so a
    * user coming from `psql` runs the same `SELECT * FROM
    * all_rankings_with_delta_view WHERE date = …` unchanged via
    * `spark.sql`. */
  def register(db: MusicDb): Unit = {
    allRankings(db).createOrReplaceTempView("all_rankings_view")
    allRankingsWithUrls(db).createOrReplaceTempView("all_rankings_with_urls_view")
    allRankingsWithDelta(db).createOrReplaceTempView("all_rankings_with_delta_view")
  }

  /** X2 `calculate_rank_delta_between_dates_fn` (behavior.sql:36-54):
    * equi self-join on (isrc, source) with per-side date predicates;
    * delta = comparison.rank - baseline.rank. Pushdown reduces each
    * side to one pruned scan; at scale with a date-partitioned fact,
    * one partition each.
    */
  def rankDeltaBetweenDates(db: MusicDb, baseline: Date, comparison: Date): DataFrame = {
    val t1 = db.ranking.where(col("ranking_date") === lit(baseline)).as("t1")
    val t2 = db.ranking.where(col("ranking_date") === lit(comparison)).as("t2")
    t1.join(t2, Seq("isrc", "ranking_source"))
      .select(
        col("ranking_source").as("platform"),
        col("isrc"),
        (col("t2.rank") - col("t1.rank")).as("delta"))
      // isrc tie-break makes the sort a total order — equal deltas
      // would otherwise land in partition-dependent order
      .orderBy(sourceEnumOrder(col("platform")).asc, col("delta").desc,
        col("isrc").asc)
  }
}
