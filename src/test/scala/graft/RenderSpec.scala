package graft

import graft.report.Render
import graft.report.Render.SongRow

/** F6 escaping, F11 glyphs, F9 date format, F7 embed rewrites. */
class RenderSpec extends SparkSpec {

  test("F6: all 17 special characters escaped, others untouched") {
    val in = "`_*~{}[]()#+-.!|$ plain"
    val out = Render.escapeSpecialCharacters(in)
    assert(out == "\\`\\_\\*\\~\\{\\}\\[\\]\\(\\)\\#\\+\\-\\.\\!\\|\\$ plain")
    assert(Render.escapeSpecialCharacters("Oasis - Wonderwall - Remastered")
      == "Oasis \\- Wonderwall \\- Remastered")
  }

  test("F11 glyphs: new / +n / -n / em-dash") {
    assert(Render.deltaGlyph(None) == "new")
    assert(Render.deltaGlyph(Some(3)) == "+3")
    assert(Render.deltaGlyph(Some(-1)) == "-1")
    assert(Render.deltaGlyph(Some(0)) == "—")
  }

  test("F9 date format matches python %A, %B %d, %Y with zero-strip") {
    assert(Render.formatDate(java.time.LocalDate.of(2026, 7, 24)) == "Friday, July 24, 2026")
    assert(Render.formatDate(java.time.LocalDate.of(2026, 7, 4)) == "Saturday, July 4, 2026")
  }

  test("F7 embed rewrites") {
    assert(Render.spotifyEmbedSrc("https://open.spotify.com/track/abc")
      == "https://open.spotify.com/embed/track/abc?theme=0")
    assert(Render.appleMusicEmbedSrc("https://music.apple.com/us/album/x")
      == "https://embed.music.apple.com/us/album/x")
  }

  test("readme layout: empty apple cell for missing url") {
    val md = Render.readme("D", Seq(SongRow("S", "su", None, None)), Nil)
    assert(md.contains("| new | 1 | S | [link](su) |  |\n"))
  }
}
