package graft

import java.nio.file.{Files, Path}
import java.time.LocalDate

import graft.ingest.Sources

/** Drives [[DailyEtl.run]] — the composition `main` wires — over
  * fixture files exactly as a deployment would invoke the binary:
  * two daily runs against a fresh store, CSV sinks, rendered README,
  * idempotent re-run, and the reference's short-chart abort. The
  * library-level twin is PipelineE2ESpec; this one goes through the
  * entry point's own fetch/commit/render plumbing. */
class DailyEtlSpec extends SparkSpec {

  private def write(p: Path, s: String): String = {
    Files.write(p, s.getBytes("UTF-8")); p.toString
  }

  private def playlistHtml(ids: Seq[String]): String =
    ids.map(i =>
      s"""<meta name="music:song" content="https://open.spotify.com/track/$i"/>""")
      .mkString("<html><head>", "\n", "</head></html>")

  private def tracksJson(ids: Seq[String]): String = {
    val tracks = ids.zipWithIndex.map { case (id, i) =>
      s"""{"external_ids":{"isrc":"ISRC$id"},
         | "artists":[{"id":"art$id","name":"Artist $id"},{"id":"shared","name":"Common"}],
         | "duration_ms":${1000 + i},"explicit":${i % 2 == 0},
         | "external_urls":{"spotify":"https://open.spotify.com/track/$id"},
         | "name":"Song $id"}""".stripMargin
    }.mkString(",")
    s"""{"tracks":[$tracks]}"""
  }

  test("two daily runs through the binary: store commits, CSVs, rendered README, idempotent re-run") {
    val dir = Files.createTempDirectory("dailyetl")
    val store = s"$dir/store"
    val readme = s"$dir/README.md"
    val csv = s"$dir/csv"
    Files.createDirectories(java.nio.file.Paths.get(csv))
    val fetcher = new Sources.FileFetcher(Map.empty)
    val ids1 = (1 to 10).map(i => s"t$i")

    // --- day 1 ---
    val r1 = DailyEtl.run(spark, fetcher, DailyEtl.Config(
      store, LocalDate.of(2026, 2, 1),
      write(java.nio.file.Paths.get(s"$dir/playlist1.html"), playlistHtml(ids1 :+ "t11" :+ "t12")),
      write(java.nio.file.Paths.get(s"$dir/tracks1.json"), tracksJson(ids1)),
      readme, Some(csv)))
    assert(r1.insertedSongs.count() === 10)
    assert(r1.insertedArtists.count() === 11) // 10 distinct + "Common"
    assert(r1.insertedRankings.count() === 10)

    // --- day 2: t1 drops out, everyone shifts up, t99 enters ---
    val ids2 = ids1.drop(1) :+ "t99"
    val cfg2 = DailyEtl.Config(
      store, LocalDate.of(2026, 2, 2),
      write(java.nio.file.Paths.get(s"$dir/playlist2.html"), playlistHtml(ids2)),
      write(java.nio.file.Paths.get(s"$dir/tracks2.json"), tracksJson(ids2)),
      readme, Some(csv))
    val r2 = DailyEtl.run(spark, fetcher, cfg2)
    assert(r2.insertedSongs.count() === 1) // only the newcomer
    assert(r2.insertedRankings.count() === 10)

    // rendered README: delta view over the committed store
    val md = new String(Files.readAllBytes(java.nio.file.Paths.get(readme)), "UTF-8")
    assert(md.startsWith("# Daily Top Songs"))
    assert(md.contains("February 2, 2026"))
    assert(md.contains("| new | 10 |")) // t99 is a newcomer
    assert(md.contains("+1")) // survivors moved up
    assert(md.contains("""Artist t2, Common \- Song t2"""))

    // CSV append sinks accumulated BOTH days
    val rankingCsv = spark.read
      .schema("ranking_id INT, isrc STRING, ranking_date STRING, rank INT, ranking_source STRING")
      .csv(s"$csv/ranking.csv")
    assert(rankingCsv.count() === 20)
    assert(rankingCsv.where("ranking_date = '2026-02-02'").count() === 10)
    assert(spark.read.text(s"$csv/artist.csv").count() === 12) // 11 + t99's artist

    // re-running day 2 is a no-op for the data (idempotent daily
    // cron) and leaves the rendered README byte-identical
    val r2again = DailyEtl.run(spark, fetcher, cfg2)
    assert(r2again.insertedRankings.count() === 0)
    assert(r2again.db.ranking.count() === 20)
    val mdAgain = new String(Files.readAllBytes(java.nio.file.Paths.get(readme)), "UTF-8")
    assert(mdAgain === md)
  }

  test("a short chart aborts the run before anything is loaded") {
    val dir = Files.createTempDirectory("dailyetl_short")
    val store = s"$dir/store"
    val fetcher = new Sources.FileFetcher(Map.empty)
    val e = intercept[DailyEtl.SongDataNotFoundError] {
      DailyEtl.run(spark, fetcher, DailyEtl.Config(
        store, LocalDate.of(2026, 2, 1),
        write(java.nio.file.Paths.get(s"$dir/p.html"),
          playlistHtml((1 to 9).map(i => s"t$i"))),
        write(java.nio.file.Paths.get(s"$dir/t.json"),
          tracksJson((1 to 9).map(i => s"t$i"))),
        s"$dir/README.md", None))
    }
    assert(e.getMessage.contains("expected 10 songs, got 9"))
    // nothing was committed — the store stays absent
    assert(!Files.exists(java.nio.file.Paths.get(store)))
  }

  test("a short track-lookup response aborts the run (both fetch stages guarded)") {
    // the playlist yields a full 10 ids, but the tracks API silently
    // drops one (under-full batches are legal per response — only
    // over-full raises in the parser): the run must abort, not load
    // and render a 9-song day
    val dir = Files.createTempDirectory("dailyetl_shorttracks")
    val ids = (1 to 10).map(i => s"t$i")
    val e = intercept[DailyEtl.SongDataNotFoundError] {
      DailyEtl.run(spark, new Sources.FileFetcher(Map.empty), DailyEtl.Config(
        s"$dir/store", LocalDate.of(2026, 2, 1),
        write(java.nio.file.Paths.get(s"$dir/p.html"), playlistHtml(ids)),
        write(java.nio.file.Paths.get(s"$dir/t.json"), tracksJson(ids.drop(1))),
        s"$dir/README.md", None))
    }
    assert(e.getMessage.contains("returned 9 of 10"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/store")))
  }

  test("the daily render reads two chart dates, not the archive — byte-equal to the full-history render") {
    val dir = Files.createTempDirectory("dailyetl_renderprune")
    val store = s"$dir/store"
    val fetcher = new Sources.FileFetcher(Map.empty)
    val ids = (1 to 10).map(i => s"t$i")
    def cfg(n: Int, day: Int, idsN: Seq[String]) = DailyEtl.Config(
      store, LocalDate.of(2026, 2, day),
      write(java.nio.file.Paths.get(s"$dir/p$n.html"), playlistHtml(idsN)),
      write(java.nio.file.Paths.get(s"$dir/t$n.json"), tracksJson(idsN)),
      s"$dir/README.md", None)
    DailyEtl.run(spark, fetcher, cfg(1, 1, ids))
    DailyEtl.run(spark, fetcher, cfg(2, 2, ids.drop(1) :+ "t98"))
    DailyEtl.run(spark, fetcher, cfg(3, 3, ids.drop(2) :+ "t98" :+ "t99"))
    val written = new String(
      Files.readAllBytes(java.nio.file.Paths.get(s"$dir/README.md")), "UTF-8")

    val fmt = graft.etl.TableFormat.DefaultBackend(spark, store)
    val fullDb = graft.model.Music.MusicDb(fmt.read("artist"), fmt.read("song"),
      fmt.read("artist_song_map"), fmt.read("ranking"))
    val day3 = LocalDate.of(2026, 2, 3)
    // the pruned render is byte-equal to one over the whole archive
    assert(written == graft.report.Render.renderForDate(fullDb, day3))
    // and its ranking scan plans over the two matching day dirs only
    val store2 = new graft.etl.ManifestStore(spark, fmt,
      Seq("artist", "song", "artist_song_map", "ranking"))
    val renderDb = DailyEtl.renderDbOf(fmt, store2.pinned(store2.base), fullDb, day3)
    def dirsOf(df: org.apache.spark.sql.DataFrame) =
      df.inputFiles.map(f => f.split('/').dropRight(1).last).toSet
    assert(dirsOf(fullDb.ranking).size == 3)
    assert(dirsOf(renderDb.ranking).size == 2,
      s"the render must touch days 2-3 only, got ${dirsOf(renderDb.ranking)}")
    assert(graft.report.Render.renderForDate(renderDb, day3) == written)
  }

  test("a torn multi-table persist cannot corrupt the store: reads go through the manifest") {
    val dir = Files.createTempDirectory("dailyetl_torn")
    val store = s"$dir/store"
    val fetcher = new Sources.FileFetcher(Map.empty)
    val ids1 = (1 to 10).map(i => s"t$i")
    def cfg(n: Int, day: Int, idsN: Seq[String]) = DailyEtl.Config(
      store, LocalDate.of(2026, 2, day),
      write(java.nio.file.Paths.get(s"$dir/p$n.html"), playlistHtml(idsN)),
      write(java.nio.file.Paths.get(s"$dir/t$n.json"), tracksJson(idsN)),
      s"$dir/README.md", None)
    DailyEtl.run(spark, fetcher, cfg(1, 1, ids1))
    // simulate a crash mid-persist of a later run: an orphan artist
    // version lands WITHOUT a manifest update
    val fmt = graft.etl.TableFormat.DefaultBackend(spark, store)
    import spark.implicits._
    fmt.overwrite("artist", Seq(("junk", "Torn Writer")).toDF("artist_id", "artist_name"))
    // the next daily run reads the manifest-pinned consistent day-1
    // state, never the orphan — t99 is the only new song, and the
    // junk artist is invisible
    val r2 = DailyEtl.run(spark, fetcher, cfg(2, 2, ids1.drop(1) :+ "t99"))
    assert(r2.insertedSongs.count() === 1)
    assert(r2.db.artist.where($"artist_id" === "junk").isEmpty)
    assert(r2.db.ranking.count() === 20)
  }

  test("a pure-append day commits only its delta: one new dir per table, yesterday's files untouched") {
    val dir = Files.createTempDirectory("dailyetl_append")
    val store = s"$dir/store"
    val fetcher = new Sources.FileFetcher(Map.empty)
    val ids1 = (1 to 10).map(i => s"t$i")
    def cfg(n: Int, day: Int, idsN: Seq[String]) = DailyEtl.Config(
      store, LocalDate.of(2026, 2, day),
      write(java.nio.file.Paths.get(s"$dir/p$n.html"), playlistHtml(idsN)),
      write(java.nio.file.Paths.get(s"$dir/t$n.json"), tracksJson(idsN)),
      s"$dir/README.md", None)
    DailyEtl.run(spark, fetcher, cfg(1, 1, ids1))
    val fmt = graft.etl.TableFormat.DefaultBackend(spark, store)
      .asInstanceOf[graft.etl.ManifestParquet]
    val v1 = fmt.currentVersion("ranking")
    val day1Entries = fmt.manifestEntries("ranking", v1)

    DailyEtl.run(spark, fetcher, cfg(2, 2, ids1.drop(1) :+ "t99"))
    val v2 = fmt.currentVersion("ranking")
    val day2Entries = fmt.manifestEntries("ranking", v2)
    assert(day2Entries.take(day1Entries.size) == day1Entries &&
      day2Entries.size == day1Entries.size + 1,
      "a pure-append day must add exactly one data dir to the fact manifest")
    // the new dir holds ONLY day 2's rows — yesterday's bytes were
    // never rewritten
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val newDir =
      s"$store/ranking/${graft.etl.ManifestParquet.parseEntry(day2Entries.last).dir}"
    val fresh = spark.read.parquet(newDir)
    assert(fresh.count() == 10 &&
      fresh.where(col("ranking_date") =!= java.sql.Date.valueOf("2026-02-02")).isEmpty)
    // dims too: the song append carries only the newcomer
    val songEntries = fmt.manifestEntries("song", fmt.currentVersion("song"))
    val newSongs = spark.read.parquet(
      s"$store/song/${graft.etl.ManifestParquet.parseEntry(songEntries.last).dir}")
    assert(newSongs.select("isrc").as[String].collect().toSeq == Seq("ISRCt99"))
  }

  test("a retention day rewrites: year-old rankings drop through the X5 cascade, the store stays consistent") {
    val dir = Files.createTempDirectory("dailyetl_retention")
    val store = s"$dir/store"
    val fetcher = new Sources.FileFetcher(Map.empty)
    val ids1 = (1 to 10).map(i => s"t$i")
    def cfg(n: Int, date: LocalDate, idsN: Seq[String]) = DailyEtl.Config(
      store, date,
      write(java.nio.file.Paths.get(s"$dir/p$n.html"), playlistHtml(idsN)),
      write(java.nio.file.Paths.get(s"$dir/t$n.json"), tracksJson(idsN)),
      s"$dir/README.md", None)
    DailyEtl.run(spark, fetcher, cfg(1, LocalDate.of(2025, 1, 1), ids1))
    // 13 months later: the same chart again — day-1 rankings are past
    // the horizon; the songs survive (they rank today), so only the
    // fact rows age out
    val r2 = DailyEtl.run(spark, fetcher,
      cfg(2, LocalDate.of(2026, 2, 1), ids1))
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val fmt = graft.etl.TableFormat.DefaultBackend(spark, store)
    val ranking = fmt.read("ranking")
    assert(ranking.count() == 10 &&
      ranking.where(col("ranking_date") =!= java.sql.Date.valueOf("2026-02-01")).isEmpty,
      "the year-old rankings must be retired by the retention stage")
    assert(fmt.read("song").count() == 10 && r2.insertedSongs.isEmpty)
    // a third, ordinary day on the rewritten store appends again
    val r3 = DailyEtl.run(spark, fetcher,
      cfg(3, LocalDate.of(2026, 2, 2), ids1.drop(1) :+ "t99"))
    assert(r3.insertedSongs.count() == 1)
    assert(fmt.read("ranking").count() == 20)
  }

  test("token extraction parses the OAuth2 response shape") {
    assert(DailyEtl.accessTokenFromJson(
      """{"access_token":"abc123","token_type":"Bearer","expires_in":3600}""")
      === "abc123")
    intercept[Sources.UnexpectedContentTypeError](
      DailyEtl.accessTokenFromJson("""{"error":"invalid_client"}"""))
  }
}
