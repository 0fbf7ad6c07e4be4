package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Music
import graft.model.Music.MusicDb

/** Seed-CSV bootstrap — the Spark analog of `db/init.sh -l` (SURVEY.md
  * §3.3): read the 4 CSVs with explicit schemas (S12), apply the
  * keep-best-row dedup that `load_seed_data.sql` achieves with its
  * `ORDER BY apple_music_url NULLS LAST … ON CONFLICT DO NOTHING`
  * insert-priority trick (S14/O5), and hand back an immutable
  * [[MusicDb]]. No staging DDL needed — a DataFrame IS the temp table.
  *
  * CSV conventions (reference `etl_pipeline.py:732-742,860-871`): all
  * non-null values double-quoted; SQL NULL = unquoted empty field;
  * dates ISO-8601; booleans Python-style `True`/`False` (Spark's CSV
  * boolean parser accepts them case-insensitively).
  */
object MusicCsv {

  private def read(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "")
      .schema(schema)
      .csv(path)

  /** [[readAudited]] result: schema-clean rows, the quarantine of raw
    * malformed lines, and `release()` to drop the shared parse cache
    * once both sides are consumed — without it every audited batch
    * would pin executor storage for the session lifetime. */
  final case class AuditedRead(good: DataFrame, quarantined: DataFrame) {
    private[MusicCsv] var cached: DataFrame = _
    def release(): Unit = if (cached != null) { cached.unpersist(); cached = null }
  }

  /** Audited ingest: PERMISSIVE parse with the malformed raw line
    * captured, split into (good rows, quarantined raw lines). A batch
    * gate at scale can't just crash on row 4-billion-and-one
    * (FAILFAST) or silently null it out (plain PERMISSIVE) — the
    * quarantine keeps the raw text for replay/inspection and the good
    * side stays schema-clean. Call `release()` after consuming both
    * sides. */
  def readAudited(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): AuditedRead = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val raw = spark.read
      .option("header", "true")
      .option("nullValue", "")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      // corrupt-record extraction requires materializing the parsed
      // struct before filtering on it (SPARK-21610): cache per batch
      .cache()
    val out = AuditedRead(
      raw.where(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.where(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw_line")))
    out.cached = raw
    out
  }

  /** S14: when duplicate keys exist in the seed files, the row WITH an
    * apple_music_url must win (reference `load_seed_data.sql:22-23`).
    * `dropDuplicates` alone would lose that priority; a row_number over
    * an explicit NULLS LAST window keeps it (SURVEY.md §2.1 S14).
    */
  def keepBestRow(df: DataFrame, keys: Seq[String], priority: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(priority: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Load + dedup the full seed set. `rankingPaths` takes both the live
    * and archive files (reference commits `ranking.csv` +
    * `ranking_2024.csv`). */
  def loadSeed(
      spark: SparkSession,
      artistPath: String,
      songPath: String,
      mapPath: String,
      rankingPaths: Seq[String]): MusicDb = {
    val artist = read(spark, artistPath, Music.artistSchema)
      .dropDuplicates("artist_id")
    val song = keepBestRow(
      read(spark, songPath, Music.songSchema),
      Seq("isrc"),
      Seq(col("apple_music_url").asc_nulls_last, col("spotify_url").asc))
    val map = read(spark, mapPath, Music.artistSongMapSchema)
      .dropDuplicates("artist_id", "isrc")
    val ranking = rankingPaths
      .map(read(spark, _, Music.rankingSchema))
      .reduce(_ unionByName _)
      // both composite uniques of ranking_tb (structure.sql:68-69)
      .transform(keepBestRow(_, Seq("isrc", "ranking_date", "ranking_source"), Seq(col("rank").asc)))
      .transform(keepBestRow(_, Seq("ranking_date", "rank", "ranking_source"), Seq(col("isrc").asc)))
    MusicDb(artist, song, map, ranking)
  }

  /** Convenience: load from a directory laid out like the reference's
    * `db/csv/` (artist.csv, song.csv, artist_song_map.csv, ranking.csv
    * [+ ranking_2024.csv archive]). */
  def loadSeedDir(spark: SparkSession, dir: String, includeArchive: Boolean = false): MusicDb = {
    val archive = s"$dir/ranking_2024.csv"
    val rankings = Seq(s"$dir/ranking.csv") ++
      (if (includeArchive && new java.io.File(archive).exists()) Seq(archive) else Nil)
    loadSeed(spark, s"$dir/artist.csv", s"$dir/song.csv", s"$dir/artist_song_map.csv", rankings)
  }
}
