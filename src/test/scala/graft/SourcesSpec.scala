package graft

import graft.ingest.Sources

/** S4-S8 parsing ops + S14 seed dedup (SURVEY.md §2.1). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S4: playlist HTML -> top-10 song urls with explicit positions") {
    val metas = (1 to 12)
      .map(i => s"""<meta name="music:song" content="https://x/track/t$i"/>""")
      .mkString("\n<meta name=\"other\" content=\"skip\"/>\n")
    val pages = Seq(("p1", s"<html><head>$metas</head></html>")).toDF("page_id", "html")
    val out = Sources.songUrlsFromPlaylistHtml(pages)
      .orderBy("position")
      .select("position", "song_url").as[(Int, String)].collect()
    assert(out.length == 10)
    assert(out.head == (1, "https://x/track/t1"))
    assert(out.last == (10, "https://x/track/t10"))
  }

  test("S5: apple music variant uses property attr") {
    val pages = Seq(("p1",
      """<meta property="music:song" content="https://a/song/s1"/>""")).toDF("page_id", "html")
    val out = Sources.songUrlsFromPlaylistHtml(pages, attr = "property")
      .select("song_url").as[String].collect()
    assert(out.toSeq == Seq("https://a/song/s1"))
  }

  test("S7+P1: batched tracks JSON -> song docs with order preserved") {
    val body =
      """{"tracks":[
        |{"external_ids":{"isrc":"ISRC1"},"artists":[{"id":"a1","name":"Ann"},{"id":"a2","name":"Bob"}],
        | "duration_ms":123,"explicit":true,"external_urls":{"spotify":"su1"},"name":"One"},
        |{"external_ids":{"isrc":"ISRC2"},"artists":[{"id":"a1","name":"Ann"}],
        | "duration_ms":456,"explicit":false,"external_urls":{"spotify":"su2"},"name":"Two"}
        |]}""".stripMargin
    val docs = Sources.songDocsFromTracksJson(Seq(body).toDF("body")).orderBy("position")
    val got = docs.select("isrc", "song_name", "song_duration_ms", "is_explicit", "spotify_url", "position")
      .as[(String, String, Int, Boolean, String, Int)].collect()
    assert(got.toSeq == Seq(
      ("ISRC1", "One", 123, true, "su1", 1),
      ("ISRC2", "Two", 456, false, "su2", 2)))
    val artists = docs.where($"isrc" === "ISRC1")
      .selectExpr("artists[0].artist_name", "artists[1].artist_id")
      .as[(String, String)].head()
    assert(artists == ("Ann", "a2"))
  }

  test("S7: multi-response batches carry explicit identity — positions never collide") {
    def body(isrc: String) =
      s"""{"tracks":[{"external_ids":{"isrc":"$isrc"},"artists":[],
         | "duration_ms":1,"explicit":false,"external_urls":{"spotify":"s-$isrc"},"name":"$isrc"}]}"""
        .stripMargin
    // two batched responses in ONE frame: batch_id is the request
    // ordinal (frames have no row order) — positions order globally
    val responses = Seq((0L, body("A1")), (1L, body("B1")))
      .toDF("batch_id", "body")
    val got = Sources.songDocsFromTracksJson(responses)
      .select("isrc", "position").as[(String, Int)].collect().toSeq.sortBy(_._2)
    assert(got.map(_._1) == Seq("A1", "B1"))
    // order keys are strictly increasing across batches, never equal
    assert(got.map(_._2).distinct.size == got.size)
    assert(got.map(_._2) == got.map(_._2).sorted)
  }

  test("S7: an over-full response batch fails loudly instead of colliding positions") {
    // position = batch_id·batchSize + pos0 + 1 is an order key; a
    // response carrying MORE than batchSize tracks would silently
    // collide its tail with the next batch's positions — the guard
    // must raise instead
    def track(i: Int) =
      s"""{"external_ids":{"isrc":"I$i"},"artists":[],
         | "duration_ms":1,"explicit":false,"external_urls":{"spotify":"s$i"},"name":"N$i"}"""
        .stripMargin
    val body = s"""{"tracks":[${(1 to 3).map(track).mkString(",")}]}"""
    val df = Sources.songDocsFromTracksJson(
      Seq((0L, body)).toDF("batch_id", "body"), batchSize = 2)
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("more than 2 tracks")), e.getMessage)
    // exactly-full is fine (boundary: pos0 = batchSize - 1 passes)
    val ok = Sources.songDocsFromTracksJson(
      Seq((0L, s"""{"tracks":[${track(1)},${track(2)}]}""")).toDF("batch_id", "body"),
      batchSize = 2)
    assert(ok.select("position").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("S6: JSON-LD extraction from song page") {
    val html =
      """<html><script id="schema:song" type="application/ld+json">
        |{"audio":{"byArtist":[{"name":"Ann"},{"name":"Bob"}],"name":"The Song"}}
        |</script></html>""".stripMargin
    val out = Sources.appleMusicSongFromHtml(Seq(("p1", html)).toDF("page_id", "html"))
      .select("song_name", "artist_names").as[(String, Seq[String])].head()
    assert(out == ("The Song", Seq("Ann", "Bob")))
  }

  test("F3: search query string build") {
    val df = Seq((Seq("Ann", "Bob"), "The Song")).toDF("artists", "track")
    val q = df.select(Sources.searchQueryString($"artists", $"track")).as[String].head()
    assert(q == "artist:Ann artist:Bob track:The Song")
  }

  test("F2: track id from url") {
    val id = Seq("https://open.spotify.com/track/abc123").toDF("u")
      .select(Sources.trackIdFromUrl($"u")).as[String].head()
    assert(id == "abc123")
  }

  test("S14: keep-best-row dedup honors NULLS LAST priority") {
    val df = Seq(
      ("I1", Option.empty[String], "row_null"),
      ("I1", Some("au"), "row_url"))
      .toDF("isrc", "apple_music_url", "tag")
    val out = graft.io.MusicCsv.keepBestRow(
      df, Seq("isrc"), Seq($"apple_music_url".asc_nulls_last))
      .select("tag").as[String].collect()
    assert(out.toSeq == Seq("row_url"))
  }

  test("S1-S3: HttpFetcher dispatch, auth headers, token POST, error paths (local stub server)") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handle(path: String)(f: HttpExchange => (Int, String, String)): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        val (status, ctype, body) = f(ex)
        val bytes = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", ctype)
        ex.sendResponseHeaders(status, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    handle("/page") { _ => (200, "text/html; charset=utf-8", "<html>ok</html>") }
    handle("/api") { ex =>
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (auth.contains("Bearer tok123")) (200, "application/json", """{"ok":true}""")
      else (401, "application/json", """{"error":"unauthorized"}""")
    }
    handle("/weird") { _ => (200, "application/octet-stream", "bytes") }
    handle("/token") { ex =>
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (auth.contains(Sources.clientCredentialsHeader("id", "secret")) &&
        body == "grant_type=client_credentials")
        (200, "application/json", """{"access_token":"tok123"}""")
      else (400, "application/json", """{"error":"bad request"}""")
    }
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val f = new Sources.HttpFetcher()
      // S1 content-type dispatch
      assert(f.fetch(s"$base/page") == Sources.Html("<html>ok</html>"))
      intercept[Sources.UnexpectedContentTypeError](f.fetch(s"$base/weird"))
      // S3 token exchange: Basic header + form body verified server-side
      val tok = f.postForm(s"$base/token",
        Sources.clientCredentialsHeader("id", "secret"),
        Map("grant_type" -> "client_credentials"))
      assert(tok == Sources.Json("""{"access_token":"tok123"}"""))
      // S2 bearer pass-through: 401 without the token, JSON with it
      val denied = intercept[Sources.HttpStatusError](f.fetch(s"$base/api"))
      assert(denied.status == 401)
      assert(f.fetch(s"$base/api", Some("tok123")) == Sources.Json("""{"ok":true}"""))
    } finally server.stop(0)
  }

  test("S1: FileFetcher content-type dispatch") {
    val dir = java.nio.file.Files.createTempDirectory("fetch").toFile
    val h = new java.io.File(dir, "a.html"); val j = new java.io.File(dir, "b.json")
    java.nio.file.Files.writeString(h.toPath, "<html/>")
    java.nio.file.Files.writeString(j.toPath, "{}")
    val f = new Sources.FileFetcher(Map(
      "https://page" -> h.getPath, "https://api" -> j.getPath))
    assert(f.fetch("https://page") == Sources.Html("<html/>"))
    assert(f.fetch("https://api") == Sources.Json("{}"))
    val bad = new java.io.File(dir, "c.txt")
    java.nio.file.Files.writeString(bad.toPath, "x")
    intercept[Sources.UnexpectedContentTypeError] {
      new Sources.FileFetcher(Map("u" -> bad.getPath)).fetch("u")
    }
  }
}
