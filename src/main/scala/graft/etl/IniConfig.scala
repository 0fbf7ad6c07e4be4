package graft.etl

/** Minimal INI runtime configuration — the reference's `config.ini`
  * front end (`/root/reference/config.ini:1-8`, read at
  * `etl_pipeline.py:86-116` through Python's ConfigParser), the one
  * operational surface the engine exposed only as CLI args + env.
  *
  * Semantics match ConfigParser exactly where the reference relies on
  * them:
  *   - `[SECTION]` headers; `key = value` and `key: value` entries;
  *   - option keys are lowercased on read AND lookup (ConfigParser's
  *     default `optionxform`), section names stay case-sensitive;
  *   - the special `[DEFAULT]` section's keys are visible from every
  *     section (fallthrough — how the reference reads
  *     `config["DEFAULT"]["SPOTIFY_PLAYLIST_URL"]`);
  *   - `;` and `#` full-line comments and blank lines are ignored;
  *   - values are verbatim (no `%(...)s` interpolation — the
  *     reference uses none, and a literal `%` must survive).
  *
  * Deliberately NOT a general config system: credentials stay in env
  * vars ([[graft.DailyEtl]] `GRAFT_CLIENT_ID`/`GRAFT_CLIENT_SECRET`),
  * exactly as the reference keeps them in `.env`, so a committed
  * config file can never carry a secret.
  */
final class IniConfig private (
    private val sections: Map[String, Map[String, String]]) {

  private def defaults: Map[String, String] =
    sections.getOrElse("DEFAULT", Map.empty)

  /** Lookup with DEFAULT fallthrough; `key` is case-insensitive. */
  def get(section: String, key: String): Option[String] = {
    val k = key.toLowerCase(java.util.Locale.ROOT)
    sections.getOrElse(section, Map.empty).get(k).orElse(defaults.get(k))
  }

  /** [[get]] that fails loudly — a missing required key must name
    * itself, not surface as a downstream NPE. */
  def apply(section: String, key: String): String =
    get(section, key).getOrElse(throw new NoSuchElementException(
      s"config key [$section] $key not found (and not in [DEFAULT])"))

  def sectionNames: Set[String] = sections.keySet
}

object IniConfig {

  def load(path: String): IniConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def parse(text: String): IniConfig = {
    val sections = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    for ((raw, idx) <- text.linesIterator.zipWithIndex) {
      val line = raw.trim
      if (line.isEmpty || line.startsWith(";") || line.startsWith("#")) ()
      else if (line.startsWith("[") && line.endsWith("]")) {
        val name = line.substring(1, line.length - 1).trim
        require(name.nonEmpty, s"empty section header at line ${idx + 1}")
        current = Some(name)
        sections.getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap.empty)
        ()
      } else {
        val sep = {
          val eq = line.indexOf('='); val co = line.indexOf(':')
          if (eq < 0) co else if (co < 0) eq else math.min(eq, co)
        }
        require(sep > 0,
          s"malformed line ${idx + 1}: '$line' (expected key=value, " +
            "key: value, [section], or a ;/# comment)")
        val section = current.getOrElse(throw new IllegalArgumentException(
          s"entry before any [section] header at line ${idx + 1}"))
        val key = line.substring(0, sep).trim
          .toLowerCase(java.util.Locale.ROOT)
        sections(section)(key) = line.substring(sep + 1).trim
      }
    }
    new IniConfig(sections.map { case (s, m) => s -> m.toMap }.toMap)
  }
}
