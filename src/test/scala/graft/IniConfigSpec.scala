package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.IniConfig

/** The config.ini front end: ConfigParser-matching semantics for the
  * exact shape the reference ships (`/root/reference/config.ini:1-8`)
  * plus the resolution into [[DailyEtl.Config]]
  * (`etl_pipeline.py:86-116,401`). */
class IniConfigSpec extends AnyFunSuite {

  private val referenceShape =
    """[DEFAULT]
      |SPOTIFY_PLAYLIST_URL=https://example.test/playlist/abc
      |APPLE_MUSIC_PLAYLIST_URL=https://example.test/apple/pl.xyz
      |
      |[API]
      |SPOTIFY_BASE_API_URL=https://api.example.test
      |SPOTIFY_TOKEN_API_URL=https://accounts.example.test/api/token
      |
      |[LOGGING]
      |LOGGING_LEVEL=DEBUG
      |""".stripMargin

  test("parses the reference config.ini shape; keys case-insensitive") {
    val c = IniConfig.parse(referenceShape)
    assert(c("DEFAULT", "SPOTIFY_PLAYLIST_URL") ===
      "https://example.test/playlist/abc")
    assert(c("API", "spotify_base_api_url") === "https://api.example.test")
    assert(c("LOGGING", "LOGGING_LEVEL") === "DEBUG")
    assert(c.sectionNames === Set("DEFAULT", "API", "LOGGING"))
  }

  test("DEFAULT keys fall through to every section (ConfigParser)") {
    val c = IniConfig.parse(referenceShape)
    assert(c("API", "SPOTIFY_PLAYLIST_URL") ===
      "https://example.test/playlist/abc")
    assert(c.get("LOGGING", "missing_key").isEmpty)
    val e = intercept[NoSuchElementException](c("API", "missing_key"))
    assert(e.getMessage.contains("missing_key"))
  }

  test("comments, blanks, colon separator, verbatim % values") {
    val c = IniConfig.parse(
      """; full-line comment
        |# hash comment too
        |[S]
        |a : with colon
        |b = spaced = value
        |pct = 100%%literal
        |""".stripMargin)
    assert(c("S", "a") === "with colon")
    // only the FIRST separator splits — the value keeps the rest
    assert(c("S", "b") === "spaced = value")
    // no interpolation: % survives verbatim
    assert(c("S", "pct") === "100%%literal")
  }

  test("malformed input fails loudly with the line number") {
    val e1 = intercept[IllegalArgumentException](
      IniConfig.parse("[S]\nno separator here\n"))
    assert(e1.getMessage.contains("line 2"))
    val e2 = intercept[IllegalArgumentException](
      IniConfig.parse("orphan=entry\n"))
    assert(e2.getMessage.contains("before any [section]"))
  }

  test("configFromIni: base-URL slash normalization, {ids} template, log-level mapping") {
    val c = IniConfig.parse(referenceShape)
    val (cfg, logLevel, tokenUrl) = DailyEtl.configFromIni(
      c, "/tmp/store", java.time.LocalDate.parse("2026-01-02"),
      "/tmp/README.md", None)
    // the token ENDPOINT comes from the config file (etl_pipeline.py:95);
    // credentials stay env-only
    assert(tokenUrl === Some("https://accounts.example.test/api/token"))
    assert(cfg.playlistSource === "https://example.test/playlist/abc")
    // no trailing slash in the INI -> normalized, then the reference's
    // batched endpoint path (etl_pipeline.py:98-99,401)
    assert(cfg.tracksSource === "https://api.example.test/v1/tracks?ids={ids}")
    assert(logLevel === "DEBUG")

    def level(ini: String): String =
      DailyEtl.configFromIni(IniConfig.parse(ini), "/s",
        java.time.LocalDate.parse("2026-01-02"), "/r", None)._2
    // no [API] SPOTIFY_TOKEN_API_URL -> no token endpoint (env fallback)
    assert(DailyEtl.configFromIni(IniConfig.parse(
      "[DEFAULT]\nSPOTIFY_PLAYLIST_URL=u\n[API]\nSPOTIFY_BASE_API_URL=b/\n"),
      "/s", java.time.LocalDate.parse("2026-01-02"), "/r", None)._3.isEmpty)
    val base =
      "[DEFAULT]\nSPOTIFY_PLAYLIST_URL=u\n[API]\nSPOTIFY_BASE_API_URL=b/\n"
    // empty / NOTSET disable logging (etl_pipeline.py:105-107); the
    // Python names map onto log4j's
    assert(level(base + "[LOGGING]\nLOGGING_LEVEL=\n") === "OFF")
    assert(level(base + "[LOGGING]\nLOGGING_LEVEL=NOTSET\n") === "OFF")
    assert(level(base) === "OFF")
    assert(level(base + "[LOGGING]\nLOGGING_LEVEL=CRITICAL\n") === "FATAL")
    assert(level(base + "[LOGGING]\nLOGGING_LEVEL=WARNING\n") === "WARN")
    assert(level(base + "[LOGGING]\nLOGGING_LEVEL=INFO\n") === "INFO")
    // and the already-slashed base gains no second slash
    val (cfg2, _, _) = DailyEtl.configFromIni(IniConfig.parse(base), "/s",
      java.time.LocalDate.parse("2026-01-02"), "/r", Some("/csv"))
    assert(cfg2.tracksSource === "b/v1/tracks?ids={ids}")
    assert(cfg2.csvDir === Some("/csv"))
  }
}
