package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.io.MusicCsv
import graft.model.Music.MusicDb
import graft.query.Views
import graft.report.Render

/** W1 delta-view semantics (SURVEY.md §5): gap ⇒ NULL, first
  * appearance ⇒ NULL, same rank ⇒ 0, cross-source isolation — plus the
  * golden end-to-end render against the reference's committed
  * README.md (reference repo @ /root/reference, read-only fixtures).
  */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private def mkDb(rankings: Seq[(String, String, Int, String)]): MusicDb = {
    val ranking = rankings
      .map { case (i, dt, r, s) => (i, d(dt), r, s) }
      .toDF("isrc", "ranking_date", "rank", "ranking_source")
    val song = Seq(("I1", "Song One", 1000, false, "su1", Option.empty[String]),
      ("I2", "Song Two", 2000, true, "su2", Some("au2")))
      .toDF("isrc", "song_name", "song_duration_ms", "is_explicit", "spotify_url", "apple_music_url")
    val artist = Seq(("A1", "Zeta"), ("A2", "Alpha")).toDF("artist_id", "artist_name")
    val map = Seq(("A1", "I1"), ("A2", "I1"), ("A1", "I2")).toDF("artist_id", "isrc")
    MusicDb(artist, song, map, ranking)
  }

  test("delta: consecutive day => lag - rank; gap/first => NULL; same rank => 0") {
    val db = mkDb(Seq(
      ("I1", "2026-01-01", 3, "Spotify"),
      ("I1", "2026-01-02", 1, "Spotify"), // consecutive: 3-1 = +2
      ("I1", "2026-01-04", 1, "Spotify"), // gap => NULL
      ("I1", "2026-01-05", 1, "Spotify"), // consecutive same rank => 0
      ("I2", "2026-01-02", 2, "Spotify"))) // first appearance => NULL
    val out = Views.allRankingsWithDelta(db)
      .select("date", "rank", "delta").where($"isrc".isNull || lit(true))
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), if (r.isNullAt(2)) null else r.getInt(2)))
    assert(out.toSeq == Seq(
      ("2026-01-05", 1, 0),
      ("2026-01-04", 1, null),
      ("2026-01-02", 1, 2),
      ("2026-01-02", 2, null),
      ("2026-01-01", 3, null)))
  }

  test("delta: source series are isolated (same isrc, different platform)") {
    val db = mkDb(Seq(
      ("I1", "2026-01-01", 1, "Spotify"),
      ("I1", "2026-01-02", 5, "Apple Music"))) // no Spotify lag leak
    val deltas = Views.allRankingsWithDelta(db)
      .select("delta").collect().map(r => r.isNullAt(0))
    assert(deltas.forall(identity), "cross-source lag must not produce a delta")
  }

  test("songInfo: ordered artist agg + NULL-propagating concat (X1/A1/F1)") {
    val db = mkDb(Seq(("I1", "2026-01-01", 1, "Spotify")))
    val info = Views.songInfo(db).orderBy("isrc")
      .select("isrc", "song").as[(String, String)].collect()
    // I1 has artists Zeta + Alpha -> sorted "Alpha, Zeta"
    assert(info(0) == ("I1", "Alpha, Zeta - Song One"))
    // I2 has one artist
    assert(info(1) == ("I2", "Zeta - Song Two"))
  }

  test("songInfo: song with no artists renders NULL (|| null semantics)") {
    val db0 = mkDb(Nil)
    val db = db0.copy(artistSongMap = db0.artistSongMap.where($"isrc" =!= "I2"))
    val row = Views.songInfo(db).where($"isrc" === "I2").select("song").collect()
    assert(row.length == 1 && row(0).isNullAt(0))
  }

  test("view sort uses enum declaration order: Spotify before Apple Music") {
    val db = mkDb(Seq(
      ("I1", "2026-01-01", 1, "Apple Music"),
      ("I2", "2026-01-01", 1, "Spotify")))
    val platforms = Views.allRankings(db).select("platform").as[String].collect()
    assert(platforms.toSeq == Seq("Spotify", "Apple Music"))
  }

  test("rankDeltaBetweenDates: t2.rank - t1.rank, ordered platform-enum then delta desc (X2)") {
    val db = mkDb(Seq(
      ("I1", "2026-01-01", 3, "Spotify"), ("I1", "2026-01-02", 1, "Spotify"),
      ("I2", "2026-01-01", 1, "Spotify"), ("I2", "2026-01-02", 4, "Spotify")))
    val out = Views.rankDeltaBetweenDates(db, d("2026-01-01"), d("2026-01-02"))
      .select("isrc", "delta").as[(String, Int)].collect()
    assert(out.toSeq == Seq(("I2", 3), ("I1", -2)))
  }

  test("rankDeltaBetweenDates: total order — delta ties break on isrc, stable under repartitioning") {
    // four isrcs all with delta 0 → only the isrc tie-break orders them
    val days = Seq("2026-01-01", "2026-01-02")
    val db = mkDb(for {
      (i, r) <- Seq(("I4", 4), ("I2", 2), ("I3", 3), ("I1", 1))
      dt <- days
    } yield (i, dt, r, "Spotify"))
    val expected = Seq("I1", "I2", "I3", "I4")
    (1 to 7 by 3).foreach { n =>
      val shuffled = db.copy(ranking = db.ranking.repartition(n))
      val out = Views.rankDeltaBetweenDates(shuffled, d("2026-01-01"), d("2026-01-02"))
        .select("isrc").as[String].collect().toSeq
      assert(out == expected, s"order unstable at $n partitions")
    }
  }

  test("register exposes the views under the reference's SQL names") {
    val db = mkDb(Seq(
      ("I1", "2024-01-01", 1, "Spotify"),
      ("I1", "2024-01-02", 2, "Spotify"),
      ("I2", "2024-01-02", 1, "Spotify")))
    Views.register(db)
    val r = spark.sql(
      """SELECT platform, rank, song, delta
        |FROM all_rankings_with_delta_view WHERE date = DATE '2024-01-02'
        |ORDER BY rank""".stripMargin).collect()
    assert(r.length == 2)
    assert(r(1).getAs[Int]("delta") == -1) // I1 slid 1 → 2
    assert(spark.sql("SELECT COUNT(*) FROM all_rankings_view").head().getLong(0) == 3)
    assert(spark.sql("SELECT spotify_url FROM all_rankings_with_urls_view").count() == 3)
  }

  test("GOLDEN: render for 2026-07-24 reproduces the reference README byte-for-byte") {
    val db = MusicCsv.loadSeedDir(spark, "/root/reference/db/csv").cached()
    val got = Render.renderForDate(db, java.time.LocalDate.of(2026, 7, 24))
    val expected = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/README.md")), "UTF-8")
    assert(got == expected)
  }
}
