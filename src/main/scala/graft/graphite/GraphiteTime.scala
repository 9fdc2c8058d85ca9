package graft.graphite

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Graphite from/until time-spec parsing — a restatement of the
  * reference's `src/query/graphite/graphite/timespec.go:139`
  * (`ParseTime`), the parser the render and find handlers run on
  * their `from`/`until` params
  * (api/v1/handler/graphite/render_parser.go:114-131):
  *
  *   - `now` — the evaluation instant
  *   - `-N<unit>` relative to now, unit ∈ s|min|h|d|w|mon|y
  *     (timespec.go:33 reRelativeTime; trailing letters tolerated, so
  *     `-3days` reads as `-3d`; mon = 30d, y = 365d per the periods
  *     table at :42)
  *   - absolute forms (timespec.go:95 formats, underscores literal —
  *     the reference swaps them for spaces only to dodge a Go
  *     time.Parse quirk): `HH:MM_YYMMDD`, `HH:MM_YYYYMMDD`,
  *     `HH:MM_MM/DD/YY`, `HH:MM_DD.MM.YY`, `DD.MM.YY`, `MM/DD/YY`,
  *     `MM/DD/YYYY`, `YYMMDD`, `YYYYMMDD` — all UTC, date-only forms
  *     at midnight, with the handler's absolute-offset applied
  *   - bare integers as epoch seconds
  */
object GraphiteTime {

  import GraphiteParser.ParseException

  private val relRe = "(?i)^-([0-9]+)(s|min|h|d|w|mon|y).*$".r

  private val periodS = Map(
    "s" -> 1L, "min" -> 60L, "h" -> 3600L, "d" -> 86400L,
    "w" -> 604800L, "mon" -> 2592000L, "y" -> 31536000L)

  // (pattern, hasTime): Java formatter twins of timespec.go:95
  private val formats: Seq[(DateTimeFormatter, Boolean)] = Seq(
    ("HH:mm_yyMMdd", true), ("HH:mm_yyyyMMdd", true),
    ("HH:mm_MM/dd/yy", true), ("HH:mm_dd.MM.yy", true),
    ("dd.MM.yy", false), ("MM/dd/yy", false), ("MM/dd/yyyy", false),
    ("yyMMdd", false), ("yyyyMMdd", false))
    .map { case (p, t) => (DateTimeFormatter.ofPattern(p), t) }

  /** Parse a graphite time spec to epoch seconds; `absOffsetS` is the
    * handler's tz offset applied to ABSOLUTE forms only
    * (timespec.go:163). */
  def parseTime(s: String, nowS: Long, absOffsetS: Long = 0L): Long = {
    val trimmed = s.trim
    if (trimmed.isEmpty)
      throw new ParseException("time cannot be empty")
    if (trimmed == "now") return nowS
    trimmed match {
      case relRe(n, unit) =>
        return nowS - n.toLong * periodS(unit.toLowerCase)
      case _ =>
    }
    for ((fmt, hasTime) <- formats) {
      try {
        val t =
          if (hasTime) LocalDateTime.parse(trimmed, fmt)
          else LocalDate.parse(trimmed, fmt).atStartOfDay()
        return t.toEpochSecond(ZoneOffset.UTC) + absOffsetS
      } catch { case _: java.time.format.DateTimeParseException => }
    }
    try trimmed.toLong
    catch {
      case _: NumberFormatException =>
        throw new ParseException(s"invalid time spec $trimmed")
    }
  }

  /** ParseDuration (timespec.go:323): accepts ONLY the `-N<unit>`
    * relative form and yields NEGATIVE seconds — the render API's
    * `offset` param (render_parser.go:156) therefore always shifts
    * the window into the past. */
  def parseDuration(s: String): Long = s.trim match {
    case relRe(n, unit) => -n.toLong * periodS(unit.toLowerCase)
    case other => throw new ParseException(s"invalid relative time $other")
  }

  /** FormatTime (timespec.go:123): the canonical `HH:MM_YYMMDD`. */
  def formatTime(epochS: Long): String =
    LocalDateTime.ofInstant(Instant.ofEpochSecond(epochS), ZoneOffset.UTC)
      .format(formats.head._1)
}
