package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion connectors S1-S8 (SURVEY.md §2.1): fetching is a
  * driver-side concern behind [[Fetcher]] (zero-egress builds use
  * [[FileFetcher]] over fixture files — same trait a real HTTP impl
  * would use); PARSING is Spark-side so a million playlist pages scale
  * exactly like ten (`spark.read.text` → regexp/from_json, no
  * BeautifulSoup-style driver loop).
  */
object Sources {

  /** S1 content-negotiation result. */
  sealed trait Fetched
  final case class Html(body: String) extends Fetched
  final case class Json(body: String) extends Fetched

  final class UnexpectedContentTypeError(msg: String) extends RuntimeException(msg)

  /** S1/S2: GET with Content-Type dispatch; bearer token optional.
    * (reference `etl_pipeline.py:177-257`). */
  trait Fetcher {
    def fetch(url: String, bearerToken: Option[String] = None): Fetched
  }

  /** Zero-egress impl: url → fixture file. `.html` → Html, `.json` →
    * Json, else UnexpectedContentTypeError — mirroring the reference's
    * content-type dispatch. */
  final class FileFetcher(mapping: Map[String, String]) extends Fetcher {
    def fetch(url: String, bearerToken: Option[String]): Fetched = {
      val path = mapping.getOrElse(url, url)
      val body = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
      if (path.endsWith(".html")) Html(body)
      else if (path.endsWith(".json")) Json(body)
      else throw new UnexpectedContentTypeError(s"Unexpected content type for '$url'")
    }
  }

  final class HttpStatusError(val status: Int, url: String)
    extends RuntimeException(s"HTTP $status for '$url'")

  /** S1/S2 real HTTP impl over `java.net.http.HttpClient` (reference
    * `etl_pipeline.py:177-257`): GET with optional bearer header,
    * Content-Type dispatch (text/html → [[Html]], application/json →
    * [[Json]], else [[UnexpectedContentTypeError]]), non-2xx →
    * [[HttpStatusError]]. Constructor-injected wherever a [[Fetcher]]
    * is needed, so zero-egress builds and specs keep [[FileFetcher]].
    * Fetching stays a driver-side control-plane concern — bodies go
    * straight into DataFrames and all parsing runs on executors. */
  final class HttpFetcher(
      client: java.net.http.HttpClient =
        java.net.http.HttpClient.newBuilder()
          .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
          .connectTimeout(java.time.Duration.ofSeconds(10))
          .build(),
      requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(30))
    extends Fetcher {
    import java.net.http.{HttpRequest, HttpResponse}

    def fetch(url: String, bearerToken: Option[String]): Fetched = {
      // per-request timeout: a server that accepts the connection but
      // never answers must raise, not wedge the ingest control plane
      val b = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(requestTimeout).GET()
      bearerToken.foreach(t => b.header("Authorization", s"Bearer $t"))
      dispatch(url, client.send(b.build(), HttpResponse.BodyHandlers.ofString()))
    }

    /** S3: OAuth2 client-credentials token exchange (reference
      * `etl_pipeline.py:259-293`) — form-encoded POST with the Basic
      * header from [[clientCredentialsHeader]]; the token endpoint
      * must answer JSON. */
    def postForm(url: String, authHeader: String, form: Map[String, String]): Json = {
      val body = form
        .map { case (k, v) =>
          java.net.URLEncoder.encode(k, "UTF-8") + "=" +
            java.net.URLEncoder.encode(v, "UTF-8")
        }
        .mkString("&")
      val req = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(requestTimeout)
        .header("Authorization", authHeader)
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build()
      dispatch(url, client.send(req, HttpResponse.BodyHandlers.ofString())) match {
        case j: Json => j
        case _ =>
          throw new UnexpectedContentTypeError(s"Expected JSON token response from '$url'")
      }
    }

    private def dispatch(url: String, resp: HttpResponse[String]): Fetched = {
      if (resp.statusCode() / 100 != 2) throw new HttpStatusError(resp.statusCode(), url)
      val ct = resp.headers().firstValue("Content-Type").orElse("")
      if (ct.startsWith("text/html")) Html(resp.body())
      else if (ct.startsWith("application/json")) Json(resp.body())
      else throw new UnexpectedContentTypeError(
        s"Unexpected content type '$ct' for '$url'")
    }
  }

  /** S3 OAuth2 client-credentials: the base64(id:secret) header value
    * ([[HttpFetcher.postForm]] carries it on the token POST). */
  def clientCredentialsHeader(clientId: String, clientSecret: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes("UTF-8"))

  // ---- Spark-side parsing ------------------------------------------

  /** S4/S5 (reference `etl_pipeline.py:296-323,416-445`): scrape the
    * top-10 song URLs from playlist-page HTML. One input row per page
    * (page_id, html); output (page_id, position, song_url) with the
    * LIMIT applied per page via the array slice — order is carried as
    * an explicit column, never row order (SURVEY.md §7.4 risk 3).
    *
    * @param attr `name` for Spotify pages, `property` for Apple Music.
    */
  def songUrlsFromPlaylistHtml(pages: DataFrame, attr: String = "name", limit: Int = 10): DataFrame = {
    val metaRe = "<meta[^>]*" + attr + "=\"music:song\"[^>]*content=\"([^\"]+)\"[^>]*/?>"
    pages
      .select(
        col("page_id"),
        slice(regexp_extract_all(col("html"), lit(metaRe), lit(1)), 1, limit).as("urls"))
      .select(col("page_id"), posexplode(col("urls")).as(Seq("pos0", "song_url")))
      .select(col("page_id"), (col("pos0") + 1).as("position"), col("song_url"))
  }

  /** F2: trailing path segment = the track id
    * (reference `etl_pipeline.py:397`). */
  def trackIdFromUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(split(url, "/"), -1)

  /** S7 batched track-lookup response schema — explicit, mirroring the
    * fields the reference projects (`etl_pipeline.py:326-363`). */
  val tracksResponseSchema: StructType = StructType(Seq(
    StructField("tracks", ArrayType(StructType(Seq(
      StructField("external_ids", StructType(Seq(
        StructField("isrc", StringType)))),
      StructField("artists", ArrayType(StructType(Seq(
        StructField("id", StringType),
        StructField("name", StringType))))),
      StructField("duration_ms", IntegerType),
      StructField("explicit", BooleanType),
      StructField("external_urls", StructType(Seq(
        StructField("spotify", StringType)))),
      StructField("name", StringType)))))))

  /** S7 + P1: nested API JSON → flat song docs (one row per track,
    * artists still nested; position carried explicitly, which the API
    * guarantees per response). Output matches
    * [[graft.model.Music.SongDoc]] minus apple_music_url (added NULL
    * here, enriched later by the Apple Music path J6/S10).
    *
    * Multi-response identity (SURVEY §7.4 risk 3 — order is always an
    * explicit column, like the HTML path's `page_id`): when
    * `responses` carries more than one row, it MUST carry a
    * `batch_id` ordinal (the request sequence) — Spark frames have no
    * row order, and without it positions would restart per response
    * and collide, making the downstream W2 rank window
    * nondeterministic. `position = batch_id·batchSize + in-batch pos`
    * is an ORDER key, not a dense index: short batches leave gaps,
    * which the rank window collapses. A single-response frame may
    * omit `batch_id` (treated as 0). */
  def songDocsFromTracksJson(
      responses: DataFrame, source: String = "Spotify",
      batchSize: Int = 50): DataFrame = {
    val keyed =
      if (responses.columns.contains("batch_id")) responses
      else responses.withColumn("batch_id", lit(0L))
    keyed
      .select(col("batch_id"),
        from_json(col("body"), tracksResponseSchema).as("r"))
      .select(col("batch_id"), posexplode(col("r.tracks")).as(Seq("pos0", "t")))
      .select(
        col("t.external_ids.isrc").as("isrc"),
        col("t.name").as("song_name"),
        col("t.duration_ms").as("song_duration_ms"),
        col("t.explicit").as("is_explicit"),
        col("t.external_urls.spotify").as("spotify_url"),
        lit(null).cast(StringType).as("apple_music_url"),
        transform(col("t.artists"),
          a => struct(
            a.getField("id").as("artist_id"),
            a.getField("name").as("artist_name"))).as("artists"),
        lit(source).as("source"),
        // order-key guard: the formula assumes ≤ batchSize tracks per
        // response — an over-full response would silently collide its
        // tail with the next batch's positions (re-introducing the W2
        // rank nondeterminism this key exists to prevent), so fail
        // loudly instead
        when(col("pos0") >= lit(batchSize), raise_error(concat(
            lit(s"response batch carries more than $batchSize tracks (pos0="),
            col("pos0"), lit(")"))))
          .otherwise(col("batch_id") * batchSize + col("pos0") + 1)
          .cast("int").as("position"))
  }

  /** S6 (reference `etl_pipeline.py:448-484`): Apple Music song-page
    * JSON-LD — extract the `<script id=schema:song>` body, parse with
    * an explicit schema, project artist names + title. */
  val jsonLdSchema: StructType = StructType(Seq(
    StructField("audio", StructType(Seq(
      StructField("byArtist", ArrayType(StructType(Seq(
        StructField("name", StringType))))),
      StructField("name", StringType))))))

  def appleMusicSongFromHtml(pages: DataFrame): DataFrame = {
    val scriptRe =
      "<script[^>]*id=\"schema:song\"[^>]*type=\"application/ld\\+json\"[^>]*>([\\s\\S]*?)</script>"
    pages
      .select(
        col("page_id"),
        from_json(regexp_extract(col("html"), scriptRe, 1), jsonLdSchema).as("ld"))
      .select(
        col("page_id"),
        col("ld.audio.name").as("song_name"),
        col("ld.audio.byArtist.name").as("artist_names"))
  }

  /** S8 "first search hit" (reference `etl_pipeline.py:530-560`):
    * given (query_key, candidate, position) rows, keep position-first
    * per key — row_number over an explicit order, the set-based form
    * of `results[0]`. F3 builds the query string. */
  def searchQueryString(artistNames: org.apache.spark.sql.Column, trackName: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws(" ",
      array_join(transform(artistNames, a => concat(lit("artist:"), a)), " "),
      concat(lit("track:"), trackName))

  def firstHitPerKey(hits: DataFrame, key: String = "query_key"): DataFrame =
    graft.io.MusicCsv.keepBestRow(hits, Seq(key), Seq(col("position").asc))
}
