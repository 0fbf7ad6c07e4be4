package graft.model

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The reference's relational model (SURVEY.md §1), Spark-native.
  *
  * Four tables in an N:M star: `ranking` (daily-grain fact) → `song`
  * (dim) ↔ `artist` (dim) via bridge `artist_song_map`. Schemas are
  * EXPLICIT `StructType`s mirroring the fixed DDL at reference
  * `db/sql/create_schema_structure.sql:19-70` — never inferred.
  */
object Music {

  final case class Artist(artist_id: String, artist_name: String)

  final case class Song(
      isrc: String,
      song_name: String,
      song_duration_ms: Int,
      is_explicit: Boolean,
      spotify_url: String,
      apple_music_url: Option[String])

  final case class ArtistSongMap(artist_id: String, isrc: String)

  /** `ranking_id SERIAL` is deliberately absent from the core model:
    * no analytics query reads it (SURVEY.md §1.4) and a global
    * mutable sequence does not scale. [[withRankingIds]] synthesizes
    * it on demand for consumers that expect the reference column. */
  final case class Ranking(
      isrc: String,
      ranking_date: Date,
      rank: Int,
      ranking_source: String)

  /** The documented-deviation stand-in for `ranking_id SERIAL`
    * (reference `create_schema_structure.sql:54-56`): a DENSE,
    * DETERMINISTIC id from row_number over the table's natural unique
    * order `(ranking_date, ranking_source, rank)` — stable across
    * runs and cluster layouts, unlike a sequence, which assigns by
    * arrival order. Ids are re-derived per snapshot, not persisted:
    * the reference never references a ranking_id across days either
    * (FK-free column). */
  def withRankingIds(ranking: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    // two-phase distributed rank — same ids as a global row_number
    // window without its single-partition sort (ExactRankSpec proves
    // the equivalence), so even this export-only path holds at scale
    val (ranked, _) = graft.operators.ExactRank.withGlobalRank(
      ranking,
      Seq(col("ranking_date").asc, col("ranking_source").asc, col("rank").asc),
      "ranking_id")
    ranked.withColumn("ranking_id", col("ranking_id").cast("int"))
  }

  /** In-flight nested song doc (reference `etl_pipeline.py:350-363`):
    * one row per song with its artist list still nested; `explode`
    * normalizes it into the star. */
  final case class SongDoc(
      isrc: String,
      song_name: String,
      song_duration_ms: Int,
      is_explicit: Boolean,
      spotify_url: String,
      apple_music_url: Option[String],
      artists: Seq[Artist],
      source: String,
      position: Int)

  val sources: Seq[String] = Seq("Spotify", "Apple Music")

  val artistSchema: StructType = StructType(Seq(
    StructField("artist_id", StringType, nullable = false),
    StructField("artist_name", StringType, nullable = false)))

  val songSchema: StructType = StructType(Seq(
    StructField("isrc", StringType, nullable = false),
    StructField("song_name", StringType, nullable = false),
    StructField("song_duration_ms", IntegerType, nullable = false),
    StructField("is_explicit", BooleanType, nullable = false),
    StructField("spotify_url", StringType, nullable = false),
    StructField("apple_music_url", StringType, nullable = true)))

  val artistSongMapSchema: StructType = StructType(Seq(
    StructField("artist_id", StringType, nullable = false),
    StructField("isrc", StringType, nullable = false)))

  val rankingSchema: StructType = StructType(Seq(
    StructField("isrc", StringType, nullable = false),
    StructField("ranking_date", DateType, nullable = false),
    StructField("rank", IntegerType, nullable = false),
    StructField("ranking_source", StringType, nullable = false)))

  /** Immutable snapshot of the 4-table state. Every mutating stage
    * (upsert, GC, retention) is a pure `MusicDb => MusicDb` — the Spark
    * translation of the reference's in-place Postgres mutations
    * (SURVEY.md §7.4 risk 1). */
  final case class MusicDb(
      artist: DataFrame,
      song: DataFrame,
      artistSongMap: DataFrame,
      ranking: DataFrame) {
    def cached(): MusicDb =
      MusicDb(artist.cache(), song.cache(), artistSongMap.cache(), ranking.cache())

    /** Truncate lineage between daily runs: each load layers joins/
      * windows over the previous state, so N chained days analyze in
      * O(planᴺ) without a cut. A deployment persists tables between
      * runs (parquet write = the checkpoint); in-memory pipelines and
      * tests use this. */
    def checkpointed(): MusicDb = MusicDb(
      artist.localCheckpoint(), song.localCheckpoint(),
      artistSongMap.localCheckpoint(), ranking.localCheckpoint())
  }
}
