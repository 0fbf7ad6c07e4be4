package graft.report

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.functions._

import graft.model.Music.MusicDb
import graft.query.Views

/** The Markdown report sink (S15, reference `render_templates.py` +
  * `templates/readme.md.jinja2`): query the delta view for one date,
  * collect the ≤20 rows to the driver, render byte-identical README
  * Markdown. Driver-side by design — a 20-row render is not a
  * distributed problem; the distributed part (the view) stays in
  * Spark.
  */
object Render {

  /** F6 (reference `render_templates.py:65-105`): per-char backslash
    * escaping of Markdown specials. */
  private val specialCharacters: Set[Char] =
    "`_*~{}[]()#+-.!|$".toSet

  def escapeSpecialCharacters(word: String): String =
    word.flatMap(c => if (specialCharacters(c)) s"\\$c" else c.toString)

  /** F11 delta glyphs (readme.md.jinja2:13-23): NULL→"new", >0→"+n",
    * <0→"-n", 0→"—". */
  def deltaGlyph(delta: Option[Int]): String = delta match {
    case None => "new"
    case Some(d) if d > 0 => s"+$d"
    case Some(d) if d < 0 => d.toString
    case _ => "—"
  }

  /** F9 (render_templates.py:125-126): `%A, %B %d, %Y` then strip the
    * zero-pad — bug-compatible `replace(" 0", " ")` on the whole
    * string, exactly like the reference. */
  def formatDate(d: LocalDate): String =
    d.format(DateTimeFormatter.ofPattern("EEEE, MMMM dd, yyyy", Locale.US))
      .replace(" 0", " ")

  /** F7 embed-URL rewrites (render_templates.py:165-171). */
  def spotifyEmbedSrc(url: String): String =
    url.replace("/track/", "/embed/track/") + "?theme=0"

  def appleMusicEmbedSrc(url: String): String =
    url.replace("https://music.apple.com/", "https://embed.music.apple.com/")

  final case class SongRow(
      song: String,
      spotifyUrl: String,
      appleMusicUrl: Option[String],
      delta: Option[Int])

  private def tableRows(songs: Seq[SongRow]): String =
    songs.zipWithIndex.map { case (s, i) =>
      val apple = s.appleMusicUrl.map(u => s"[link]($u)").getOrElse("")
      s"| ${deltaGlyph(s.delta)} | ${i + 1} | ${escapeSpecialCharacters(s.song)} | [link](${s.spotifyUrl}) | $apple |\n"
    }.mkString

  /** Byte-identical render of `templates/readme.md.jinja2` (verified
    * against the reference's committed README.md in RenderSpec). */
  def readme(formattedDate: String, spotify: Seq[SongRow], appleMusic: Seq[SongRow]): String = {
    val s = new StringBuilder
    s ++= "# Daily Top Songs\n\n"
    s ++= s"Showing top 10 [Spotify](#spotify) and [Apple Music](#apple-music) songs for $formattedDate. Updates daily shortly after 01:45 UTC.\n\n"
    s ++= "> [!NOTE]  \n"
    s ++= "> Collection of Apple Music song data is currently disabled due to a critical error. It is not known when this will be fixed.\n\n"
    s ++= "## Spotify\n\n"
    s ++= "|             | Rank            | Song            | Spotify Link                    | Apple Music Link                                                                             |\n"
    s ++= "| ----------- | --------------- | --------------- | ------------------------------- | -------------------------------------------------------------------------------------------- |\n"
    s ++= tableRows(spotify)
    s ++= "\n## Apple Music\n\n"
    s ++= "|             | Rank            | Song            | Spotify Link                    | Apple Music Link                   |\n"
    s ++= "| ----------- | --------------- | --------------- | ------------------------------- | ---------------------------------- |\n"
    s ++= tableRows(appleMusic)
    s.result()
  }

  /** End-to-end: delta view → P6 point-date filter (partition-prunable
    * at scale) → split by platform (the honest form of the reference's
    * positional split P7) → render. */
  def renderForDate(db: MusicDb, date: LocalDate): String = {
    val rows = Views.allRankingsWithDelta(db)
      .where(col("date") === lit(java.sql.Date.valueOf(date)))
      .select("platform", "rank", "song", "spotify_url", "apple_music_url", "delta")
      .collect()
      .map { r =>
        (r.getString(0), r.getInt(1), SongRow(
          r.getString(2),
          r.getString(3),
          Option(r.getString(4)),
          if (r.isNullAt(5)) None else Some(r.getInt(5))))
      }
    def half(platform: String) =
      rows.filter(_._1 == platform).sortBy(_._2).map(_._3).toSeq
    readme(formatDate(date), half("Spotify"), half("Apple Music"))
  }
}
