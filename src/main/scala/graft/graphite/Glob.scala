package graft.graphite

/** Graphite-style glob → regex translation — a restatement of the
  * reference's `src/query/graphite/graphite/glob.go:94-180`
  * (`globToRegexPattern`), shared by the graphite target parser, the
  * /metrics/find route and the m3ql fetch matchers.
  *
  * Dialect (one case per reference switch arm):
  *   - `\x`      escapes x (written as `\x`, glob.go:116)
  *   - `.`       hierarchy separator → `\.+` (glob.go:121-131); it is
  *               swallowed when it directly follows a `**` match-all,
  *               so `foo.**.bar` matches `foo.bar` too
  *   - `?`       one non-separator char → `[^\.]` (glob.go:132)
  *   - `*`       any run within a segment → `[^\.]*`; `**` (opt-in
  *               via allowMatchAll, glob.go:53 GlobOptions) → `.*`
  *               spanning separators (glob.go:136-146)
  *   - `{a,b}`   alternation → `(a|b)`; commas are only valid inside
  *               a brace group (glob.go:147-155, 176-182)
  *   - `[a-z]`   character range, passed through (glob.go:156-168)
  *   - `<>'$`    valid identifier runes escaped for regex
  *               (glob.go:169-171)
  *   - other     must be a [[ValidIdentifierRunes]] member
  *               (glob.go:33-37), else an invalid-character error
  *
  * Unbalanced `{`/`[`/`}`/`]` and out-of-group commas raise
  * [[GlobException]] exactly like the reference's invalid-params
  * errors (glob.go:152, 161, 181, 186).
  *
  * Two documented deviations, both strictness fixes:
  *   - a literal `|` (a valid identifier rune) is regex-quoted; the
  *     reference writes it raw, silently turning it into alternation
  *   - a trailing `\` errors here; the reference emits a dangling
  *     backslash that fails later at regex-compile time
  */
object Glob {

  final class GlobException(msg: String)
    extends IllegalArgumentException(msg)

  /** glob.go:33-37 ValidIdentifierRunes. */
  val ValidIdentifierRunes: Set[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ "$-_'|<>%#/:~").toSet

  /** Translate; returns (regex body, regexed?) where `regexed` is the
    * reference's flag for "the glob contains any pattern operator"
    * (false = the glob is a plain literal path). */
  def toRegexFlagged(glob: String,
                     allowMatchAll: Boolean = false): (String, Boolean) = {
    val sb = new StringBuilder
    var lastWriteLen = 0
    def write(s: String): Unit = { sb ++= s; lastWriteLen = s.length }
    def unwriteLast(): Unit = {
      sb.setLength(sb.length - lastWriteLen); lastWriteLen = 0
    }
    var escaping = false
    var regexed = false
    var matchAll = false
    var prevMatchAll = false
    var eval: Char = 0
    // 0 sentinel = not in a group (glob.go:101 groupStartStack)
    var stack: List[Char] = List(0.toChar)
    var i = -1
    for (r <- glob) {
      i += 1
      prevMatchAll = matchAll
      matchAll = false
      val prevEval = eval
      eval = r
      if (escaping) {
        // the escaped rune is a LITERAL. Quote punctuation with a
        // backslash (always safe in Java regex) but emit
        // alphanumerics bare — `\2` would be a backreference and
        // `\d` a character class here, where the reference's raw
        // `\`+rune passthrough (glob.go:116) feeds RE2, for which
        // `\2` is a parse error (documented deviation: we define the
        // escaped-alnum case the property oracle expects instead of
        // erroring)
        if (r.isLetterOrDigit || r == '_') write(r.toString)
        else write("\\" + r)
        escaping = false
      } else r match {
        case '\\' =>
          escaping = true
        case '.' =>
          if (!prevMatchAll) { write("\\.+"); regexed = true }
        case '?' =>
          write("[^\\.]"); regexed = true
        case '*' =>
          if (allowMatchAll && prevEval == '*') {
            unwriteLast(); write(".*"); regexed = true; matchAll = true
          } else { write("[^\\.]*"); regexed = true }
        case '{' =>
          write("("); stack = '{' :: stack; regexed = true
        case '}' =>
          if (stack.head != '{')
            throw new GlobException(
              s"invalid '}' at $i, no prior for '{' in $glob")
          write(")"); stack = stack.tail
        case '[' =>
          write("["); stack = '[' :: stack; regexed = true
        case ']' =>
          if (stack.head != '[')
            throw new GlobException(
              s"invalid ']' at $i, no prior for '[' in $glob")
          write("]"); stack = stack.tail
        case '<' | '>' | '\'' | '$' =>
          write("\\" + r)
        case ',' =>
          if (stack.head == '{') write("|")
          else throw new GlobException(
            s"invalid ',' outside of matching group at pos $i in $glob")
        case _ =>
          if (!ValidIdentifierRunes(r))
            throw new GlobException(
              s"invalid character $r at pos $i in $glob")
          if (r == '|') write("\\|") else write(r.toString)
      }
    }
    if (escaping)
      throw new GlobException(s"trailing escape in $glob")
    if (stack.lengthCompare(1) > 0)
      throw new GlobException(s"unbalanced '${stack.head}' in $glob")
    (sb.toString, regexed)
  }

  def toRegex(glob: String, allowMatchAll: Boolean = false): String =
    toRegexFlagged(glob, allowMatchAll)._1

  /** Anchored form for full-value matching (rlike is substring). */
  def anchored(glob: String, allowMatchAll: Boolean = false): String =
    "^" + toRegex(glob, allowMatchAll) + "$"

  /** Split a glob into its top-level dot segments: separators inside
    * `{}`/`[]` groups or behind a `\` escape do not split — the
    * segment-count the reference's find route derives via
    * `graphite.CountMetricParts` (m3_wrapper.go:139). */
  def splitSegments(glob: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var escaping = false
    for (r <- glob) {
      if (escaping) { cur += r; escaping = false }
      else r match {
        case '\\' => cur += r; escaping = true
        case '{' | '[' => depth += 1; cur += r
        case '}' | ']' => depth -= 1; cur += r
        case '.' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += r
      }
    }
    out += cur.toString
    out.result()
  }
}
