package graft

import graft.graphite.{Glob, Graphite, GraphiteParser}

/** Extended graphite glob dialect (glob.go:94-180 restated in
  * [[Glob]]): translation table, match behavior, error cases, and the
  * find/parse routes that consume it. */
class GlobSpec extends SparkSpec {

  private def re(g: String, matchAll: Boolean = false) =
    Glob.anchored(g, allowMatchAll = matchAll)
  private def matches(g: String, s: String, matchAll: Boolean = false) =
    s.matches(re(g, matchAll))

  test("translation table mirrors globToRegexPattern case arms") {
    assert(Glob.toRegex("foo.bar*") == "foo\\.+bar[^\\.]*")
    assert(Glob.toRegex("a?c") == "a[^\\.]c")
    assert(Glob.toRegex("{a,b}") == "(a|b)")
    assert(Glob.toRegex("[a-z]0") == "[a-z]0")
    assert(Glob.toRegex("a<b>'c$") == "a\\<b\\>\\'c\\$")
    // escapes pass the next rune through verbatim
    assert(Glob.toRegex("""a\*b""") == "a\\*b")
    assert(Glob.toRegex("""a\{b""") == "a\\{b")
    // an escaped ALPHANUMERIC emits bare — `\2` would be a Java
    // backreference and `\d` a character class (property-test find;
    // the reference's raw passthrough is an RE2 parse error there)
    assert(Glob.toRegex("""7.35g\20""") == "7\\.+35g20")
    assert(Glob.toRegex("""a\db""") == "adb")
    assert("7.35g20".matches(Glob.anchored("""7.35g\20""")))
  }

  test("regexed flag is false only for plain literals") {
    assert(!Glob.toRegexFlagged("abc_def")._2)
    assert(Glob.toRegexFlagged("abc*")._2)
    assert(Glob.toRegexFlagged("a{b,c}")._2)
    assert(Glob.toRegexFlagged("a[0-9]")._2)
    assert(Glob.toRegexFlagged("a.b")._2) // separator writes \.+
  }

  test("brace alternation and character ranges match like graphite") {
    assert(matches("servers.{prod,stag}.cpu", "servers.prod.cpu"))
    assert(matches("servers.{prod,stag}.cpu", "servers.stag.cpu"))
    assert(!matches("servers.{prod,stag}.cpu", "servers.dev.cpu"))
    assert(matches("host[0-2]x", "host1x"))
    assert(!matches("host[0-2]x", "host5x"))
    assert(matches("web.{a,b}[0-1].cpu*", "web.b1.cpu_total"))
  }

  test("** spans hierarchy separators only when allowed") {
    // glob.go:121-131 — the dot after ** is swallowed, so zero
    // intermediate segments also match
    assert(matches("foo.**.baz", "foo.baz", matchAll = true))
    assert(matches("foo.**.baz", "foo.a.baz", matchAll = true))
    assert(matches("foo.**.baz", "foo.a.b.baz", matchAll = true))
    assert(!matches("foo.**.baz", "foo.a.b", matchAll = true))
    // without AllowMatchAll, ** degrades to a within-segment *
    assert(matches("foo.**", "foo.a", matchAll = false) ==
      matches("foo.*", "foo.a"))
    assert(!matches("foo.**", "foo.a.b", matchAll = false))
  }

  test("literal metacharacter runes cannot warp the regex") {
    // '|' is a ValidIdentifierRune; the reference writes it raw,
    // silently turning it into alternation — we quote it (documented
    // deviation) so 'a|b.cpu' matches only the literal path
    assert(matches("a|b.cpu", "a|b.cpu"))
    assert(!matches("a|b.cpu", "a.cpu"))
    assert(!matches("a|b.cpu", "b.cpu"))
    // '$' via its explicit escape arm
    assert(matches("cost$usd.total", "cost$usd.total"))
  }

  test("malformed globs raise the reference's invalid-params errors") {
    intercept[Glob.GlobException](Glob.toRegex("foo.{a.bar")) // unbalanced {
    intercept[Glob.GlobException](Glob.toRegex("foo}bar"))    // } without {
    intercept[Glob.GlobException](Glob.toRegex("foo]bar"))    // ] without [
    intercept[Glob.GlobException](Glob.toRegex("foo[0-2"))    // unbalanced [
    intercept[Glob.GlobException](Glob.toRegex("a,b"))        // , outside {}
    intercept[Glob.GlobException](Glob.toRegex("a+b"))        // invalid rune
    intercept[Glob.GlobException](Glob.toRegex("a b"))        // invalid rune
    intercept[Glob.GlobException](Glob.toRegex("a\\"))        // trailing \
  }

  test("splitSegments respects groups and escapes") {
    assert(Glob.splitSegments("a.{b.c,d}.e") == Seq("a", "{b.c,d}", "e"))
    assert(Glob.splitSegments("a[x.y].b") == Seq("a[x.y]", "b"))
    assert(Glob.splitSegments("""a\.b.c""") == Seq("""a\.b""", "c"))
    assert(Glob.splitSegments("a.b.c") == Seq("a", "b", "c"))
  }

  test("target parser lexes and evaluates extended-glob paths") {
    import GraphiteParser._
    assert(parse("""summarize(events.{a,b}.*, "1d", "sum")""") ==
      Call("summarize", Seq(T(Path("events.{a,b}.*")), S("1d"), S("sum"))))
    assert(parse("events.*.user[0-2]?") == Path("events.*.user[0-2]?"))
    intercept[ParseException](parse("sumSeries(events.{a.cpu)"))
  }

  private def pathFrame = {
    val s = spark
    import s.implicits._
    Seq("root.a", "root.a.x", "root.b.y.z", "other.c")
      .map((_, 0L, 1.0)).toDF("path", "bucket_s", "value")
  }

  test("metricsFind ** returns mixed-depth nodes, all expandable") {
    val rows = Graphite.metricsFind(pathFrame, "root.**").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .toSet
    // segments at the last query level (2) or deeper of matched
    // paths; ids carry the RAW query prefix (find.go:211
    // DropLastMetricPart + "."), not the matched path's own prefix
    assert(rows == Set(("root.a", "a", 0, 1), ("root.x", "x", 0, 1),
      ("root.b", "b", 0, 1), ("root.y", "y", 0, 1),
      ("root.z", "z", 0, 1)))
  }

  test("metricsFind brace query keeps the leaf/children census") {
    val rows = Graphite.metricsFind(pathFrame, "root.{a,b}").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getInt(3))).toMap2
    assert(rows("root.a") == ((1, 1))) // terminates AND has children
    assert(rows("root.b") == ((0, 1))) // only expandable
  }

  implicit private class RowsOps(
    rows: Array[(String, Int, Int)]) {
    def toMap2: Map[String, (Int, Int)] =
      rows.map { case (id, l, c) => id -> ((l, c)) }.toMap
  }

  test("graphite from/until time specs parse like timespec.go") {
    import graft.graphite.GraphiteTime.parseTime
    val now = 1705795200L // 2024-01-21 00:00:00 UTC
    assert(parseTime("now", now) == now)
    assert(parseTime("-1h", now) == now - 3600)
    assert(parseTime("-3days", now) == now - 3 * 86400) // trailing letters
    assert(parseTime("-2min", now) == now - 120)
    assert(parseTime("-1mon", now) == now - 30 * 86400)
    assert(parseTime("-1y", now) == now - 365 * 86400)
    assert(parseTime("20240105", now) == 1704412800L)
    assert(parseTime("240105", now) == 1704412800L)   // YYMMDD
    assert(parseTime("14:38_20240105", now) == 1704412800L + 14 * 3600 + 38 * 60)
    assert(parseTime("01/05/2024", now) == 1704412800L) // MM/DD/YYYY
    assert(parseTime("05.01.24", now) == 1704412800L)   // DD.MM.YY
    assert(parseTime("1704412800", now) == 1704412800L) // epoch passthrough
    // the handler's absolute offset applies to absolute forms only
    assert(parseTime("20240105", now, absOffsetS = 3600) == 1704412800L + 3600)
    assert(parseTime("-1h", now, absOffsetS = 3600) == now - 3600)
    import graft.graphite.GraphiteParser.ParseException
    intercept[ParseException](parseTime("", now))
    intercept[ParseException](parseTime("lastweekish", now))
    assert(graft.graphite.GraphiteTime.formatTime(1704412800L) ==
      "00:00_240105")
  }

  test("render bounds restrict the fetch and push to the scan") {
    val s = spark
    import s.implicits._
    val samples = Seq(
      ("a", 1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704412800L)), 1.0, 1L),
      ("a", 1L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704758400L)), 2.0, 2L))
      .toDF("name", "user_id", "ts", "value", "event_id")
    // [from, until) keeps the first sample only
    val out = graft.graphite.GraphiteParser.render(samples,
      "events.*.*", from = "20240105", until = "-12d",
      nowS = 1705795200L)
    // the [from, until) predicate pruned the second sample before
    // consolidation (on a LocalRelation Catalyst folds the filter
    // into the scan itself — on parquet it pushes down like every
    // Fetch bound, same mechanism ts_fetch_eq's PlanSpec pin audits)
    assert(out.select("value").collect().map(_.getDouble(0)).toSeq == Seq(1.0))
  }
}
