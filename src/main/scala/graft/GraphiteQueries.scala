package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graphite.Graphite
import graft.tsdb.Vectors

/** Graphite function-library queries (SURVEY §2E3) with DuckDB
  * oracles, over the synthesized dot-path series frame. */
object GraphiteQueries {

  private def frame(s: SparkSession, dir: String): DataFrame =
    Graphite.seriesFrame(Vectors.samples(Tables.events(s, dir)))

  /** hourly path frame: last sample per (path, hour), event_id
    * tiebreak — mirrors Graphite.seriesFrame. */
  private val PF =
    """SELECT 'events.' || name || '.user' || CAST(user_id AS VARCHAR) AS path,
      | bucket_s, value FROM (
      | SELECT name, user_id, bucket_s, value FROM (
      |  SELECT event_type AS name, user_id, value,
      |   CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_s,
      |   row_number() OVER (PARTITION BY event_type, user_id,
      |     date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) AS t WHERE rn = 1) AS i""".stripMargin.replace("\n", " ")

  /** gq_render_lttb constants + its fully-unrolled DuckDB oracle.
    * LTTB's bucket walk is sequential (bucket i's pick anchors
    * bucket i+1), so the oracle unrolls the `threshold - 2` rounds
    * as a CTE chain — the corpus_bpe_train convention for
    * sequential training loops. Ranges restate lttb.go:55-113;
    * the branch rules restate lttb.go:100-110 and :127 (maxArea
    * starts at -1, so an all-zero-area bucket yields its FIRST
    * index). */
  private object LttbQ {
    val start = 1704412800L // 20240105 UTC
    val step = 3600L
    val len = 144 // 6 days hourly
    val maxDp = 10
    val every: Int = math.ceil(len.toDouble / maxDp).toInt // 15
    val threshold: Int = math.ceil(len.toDouble / every).toInt // 10

    def sql: String = {
      val end = start + len * step
      val head =
        s"""WITH pu AS (
           | SELECT event_type AS path, user_id,
           |  CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_s,
           |  CAST(round(value * 1000000, 0) AS BIGINT) AS mv,
           |  row_number() OVER (PARTITION BY event_type, user_id,
           |    date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC) AS rn
           | FROM events
           | WHERE CAST(floor(epoch(ts)) AS BIGINT) >= $start
           |  AND CAST(floor(epoch(ts)) AS BIGINT) < $end),
           |pts AS (
           | SELECT path, CAST((bucket_s - $start) / $step AS INT) AS idx,
           |  CAST(sum(mv) AS DOUBLE) AS value
           | FROM pu WHERE rn = 1 GROUP BY 1, 2),
           |s0 AS (SELECT path, 0 AS a_idx,
           |  max(CASE WHEN idx = 0 THEN value END) AS a_val FROM pts GROUP BY 1),
           |ed AS (SELECT path,
           |  max(CASE WHEN idx = ${len - 1} THEN value END) AS v_last
           |  FROM pts GROUP BY 1)""".stripMargin
      val roundCtes = (0 until threshold - 2).map { r =>
        val cs = if (r == 0) 1 else r * every + 2
        val ce = (r + 1) * every + 2
        val aS = ce
        val aE = math.min((r + 2) * every + 2, len)
        val aLen = aE - aS
        val avgCte =
          if (aLen <= 0)
            s"""a$r AS (SELECT path, CAST(NULL AS DOUBLE) AS avg_x,
               | CAST(NULL AS DOUBLE) AS avg_y FROM s$r)""".stripMargin
          else
            s"""a$r AS (SELECT path, sum(idx) / $aLen.0 AS avg_x,
               | sum(value) / $aLen.0 AS avg_y
               | FROM pts WHERE idx >= $aS AND idx < $aE GROUP BY 1)""".stripMargin
        s"""$avgCte,
           |v$r AS (SELECT path, avg(value) AS cavg
           | FROM pts WHERE idx >= $cs AND idx < $ce GROUP BY 1),
           |c$r AS (SELECT c.path,
           |  max(CASE WHEN s.a_val IS NOT NULL AND a.avg_y IS NOT NULL THEN
           |   struct_pack(area := coalesce(abs(
           |     (s.a_idx - a.avg_x) * (c.value - s.a_val)
           |     - (s.a_idx - c.idx) * (a.avg_y - s.a_val)), 0.0),
           |    negidx := -c.idx, idx := c.idx, val := c.value) END) AS best,
           |  min(CASE WHEN c.value IS NOT NULL THEN
           |   struct_pack(d := abs(v.cavg - c.value), idx := c.idx,
           |    val := c.value) END) AS close,
           |  max(CASE WHEN c.idx = $cs THEN c.value END) AS v_cs
           | FROM pts c JOIN s$r s USING (path)
           |  LEFT JOIN a$r a USING (path) JOIN v$r v USING (path)
           | WHERE c.idx >= $cs AND c.idx < $ce GROUP BY 1),
           |s${r + 1} AS (SELECT s.path,
           |  CASE WHEN s.a_val IS NOT NULL AND a.avg_y IS NOT NULL THEN
           |   CASE WHEN c.best IS NULL OR struct_extract(c.best, 'area') <= 0
           |    THEN $cs ELSE struct_extract(c.best, 'idx') END
           |  ELSE CASE WHEN c.close IS NULL THEN $cs
           |   ELSE struct_extract(c.close, 'idx') END END AS a_idx,
           |  CASE WHEN s.a_val IS NOT NULL AND a.avg_y IS NOT NULL THEN
           |   CASE WHEN c.best IS NULL OR struct_extract(c.best, 'area') <= 0
           |    THEN c.v_cs ELSE struct_extract(c.best, 'val') END
           |  ELSE CASE WHEN c.close IS NULL THEN c.v_cs
           |   ELSE struct_extract(c.close, 'val') END END AS a_val
           | FROM s$r s LEFT JOIN a$r a USING (path)
           |  LEFT JOIN c$r c USING (path))""".stripMargin
      }
      val picks =
        Seq("SELECT path, 0 AS k, a_val AS value FROM s0") ++
          (1 until threshold - 1).map(k =>
            s"SELECT path, $k AS k, a_val AS value FROM s$k") ++
          Seq(s"SELECT path, ${threshold - 1} AS k, v_last AS value FROM ed")
      val tail =
        s"""SELECT path,
           | CAST($start + k * ${every * step} AS BIGINT) AS bucket_s,
           | round(value / 1000000.0, 6) AS value
           |FROM (${picks.mkString(" UNION ALL ")}) AS o
           |ORDER BY path, bucket_s""".stripMargin
      (Seq(head) ++ roundCtes).mkString(",\n") + "\n" + tail
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gr_summarize" -> ((s, dir) =>
      Graphite.summarize(frame(s, dir), 86400L, "sum")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gr_moving_avg" -> ((s, dir) =>
      Graphite.aliasByNode(Graphite.movingAverage(frame(s, dir), 3), 1, 2)
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gr_per_second" -> ((s, dir) =>
      Graphite.perSecond(frame(s, dir))
        .select(col("path"), col("bucket_s"), round(col("value"), 9).as("value"))
        .orderBy("path", "bucket_s")),
    "gr_integral" -> ((s, dir) =>
      Graphite.integral(frame(s, dir))
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gr_highest" -> ((s, dir) =>
      // sortByMaxima∘highestMax, fused: one reduce+rank, one join
      Graphite.highestRanked(frame(s, dir), 5, "max")
        .select(col("path"), col("bucket_s"), col("value"),
          col("sort_rank").cast("long").as("sort_rank"))
        .orderBy("sort_rank", "bucket_s")),
    "gr_npercentile" -> ((s, dir) =>
      // constant series over the original buckets, renamed
      // nPercentile(name, 95.000) — the reference NPercentile shape
      Graphite.nPercentile(Graphite.averageAbove(frame(s, dir), 100.0), 95.0)
        .select(col("path"), col("bucket_s"),
          round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gr_group_sum" -> ((s, dir) =>
      Graphite.groupByNode(frame(s, dir), 1, "sum")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gr_combine" -> ((s, dir) =>
      Graphite.combineSeries(
        Graphite.exclude(Graphite.maximumAbove(frame(s, dir), 150.0), "\\.user7$"),
        "avg")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("bucket_s")),
    // parsed graphite target strings (graphite.GraphiteParser)
    "gq_expr" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """summarize(exclude(events.*.user*, "user7$"), "1d", "sum")""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_expr2" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "aliasByNode(highestMax(movingAverage(events.purchase.*, 3), 2), 1, 2)")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // registered short aliases (builtin_functions.go:3049
    // MustRegisterAliasedFunction): sum/max/min/abs parse to their
    // canonical builtins through the alias table
    "gq_aliases" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "group(abs(offset(sum(events.purchase.*), -5000)), " +
          "max(events.purchase.*), min(events.view.*))")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_median" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "movingMedian(removeAboveValue(events.purchase.*, 150), 3)")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_percent" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "asPercent(events.purchase.*, sumSeries(events.purchase.*))")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // shift/derivative chain: timeShift → counter-aware derivative →
    // offset → absolute, all through the target-string parser
    "gq_shift_chain" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """absolute(offset(nonNegativeDerivative(timeShift(events.purchase.*, "1d")), -5))""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // gap-repair chain: null-out spikes, carry last value forward,
    // default the still-null prefix — the standard dashboard cleanup
    "gq_keeplast" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """transformNull(keepLastValue(removeAboveValue(events.purchase.*, 120)), -1)""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // per-second-rate integration: total hits per day (value·stepS
    // summed into coarser buckets)
    "gq_hitcount" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """hitcount(events.purchase.*, "1d")""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // running sum resetting at each day boundary
    "gq_integral_by" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """integralByInterval(events.purchase.*, "1d")""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // time-ordered last within epoch-aligned day buckets (SafeLast)
    "gq_sum_last" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """summarize(events.purchase.*, "1d", "last")""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // xFilesFactor gate: windows under 3/4 non-null density null out
    "gq_moving_xff" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "movingAverage(events.purchase.*, 4, 0.75)")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // ---- round-3 builtin additions ----
    "gr_diff" -> ((s, dir) =>
      Graphite.diffSeries(
        frame(s, dir).where(col("path").rlike("^events\\.purchase\\.[^.]*$")))
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("bucket_s")),
    "gr_spread" -> ((s, dir) => {
      val f42 = Graphite.scale(
        frame(s, dir).where(col("path").rlike("^events\\.[^.]*\\.user42$")), 0.01)
      Graphite.rangeOfSeries(f42)
        .unionByName(Graphite.stddevSeries(f42))
        .unionByName(Graphite.multiplySeries(f42))
        .unionByName(Graphite.percentileOfSeries(f42, 90.0))
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")
    }),
    "gr_sort_total" -> ((s, dir) =>
      Graphite.sortByTotal(
        frame(s, dir).where(col("path").rlike("^events\\.purchase\\.[^.]*$")))
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"),
          col("sort_rank"))
        .orderBy("sort_rank", "bucket_s")),
    "gr_weighted" -> ((s, dir) => {
      val f = frame(s, dir)
      Graphite.weightedAverage(
        f.where(col("path").rlike("^events\\.purchase\\.[^.]*$")),
        f.where(col("path").rlike("^events\\.view\\.[^.]*$")), 2)
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("bucket_s")
    }),
    "gr_ema" -> ((s, dir) =>
      Graphite.exponentialMovingAverage(
        frame(s, dir).where(col("path").rlike("^events\\.purchase\\.user1[^.]*$")), 5)
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_wild" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """aggregateWithWildcards(events.*.user4*, "sum", 2)""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_moving2" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "movingSum(delay(events.purchase.*, 2), 3)")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_changed" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "changed(removeAboveValue(events.view.*, 130))")
        .select(col("path"), col("bucket_s"), col("value"))
        .orderBy("path", "bucket_s")),
    "gq_slice" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """roundFunction(smartSummarize(timeSlice(events.purchase.*, 1704844800, 1705708800), "6h", "max"), 2)""")
        .select(col("path"), col("bucket_s"), col("value"))
        .orderBy("path", "bucket_s")),
    "gq_hw" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "holtWintersForecast(events.purchase.user1*)")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_legend" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """legendValue(useSeriesAbove(events.purchase.*, 195, "purchase", "click"), "max")""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_cacti" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "cactiStyle(events.signup.user1?)")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_apply" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """applyByNode(events.*.user1?, 1, "sumSeries(%.*)", "%.total")""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_find" -> ((s, dir) =>
      // /metrics/find expanding the 2nd level: the event-name nodes,
      // all expandable (user leaves hang below), none terminal
      Graphite.metricsFind(frame(s, dir), "events.*").orderBy("id")),
    "gq_find_leaf" -> ((s, dir) =>
      // expanding the leaf level under one subtree: user1/10..19
      Graphite.metricsFind(frame(s, dir), "events.purchase.user1?")
        .orderBy("id")),
    // /metrics/find with the API's from/until window
    // (find_parser.go:73-97): only users who PURCHASED inside the
    // two-day window appear as leaves
    "gq_find_range" -> ((s, dir) =>
      graphite.GraphiteParser.findRange(
        Vectors.samples(Tables.events(s, dir)),
        "events.purchase.*",
        from = "20240105", until = "20240107", nowS = 1705795200L)
        .orderBy("id")),
    // extended glob dialect (glob.go:94-180) through the target
    // parser: {a,b} alternation and [0-9] character ranges
    "gq_glob_brace" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        """summarize(events.{purchase,signup}.*, "1d", "sum")""")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    "gq_glob_range" -> ((s, dir) =>
      graphite.GraphiteParser.query(
        Vectors.samples(Tables.events(s, dir)),
        "events.*.user[0-2]?")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // `**` match-all through /metrics/find (find_parser.go:109):
    // one whole-path regex, nodes at the last query level or deeper,
    // every node assumed expandable
    "gq_find_matchall" -> ((s, dir) =>
      Graphite.metricsFind(frame(s, dir), "events.**").orderBy("id")),
    // the render API's from/until window (render_parser.go:114 +
    // timespec.go ParseTime): absolute YYYYMMDD from, relative -12d
    // until against a fixed now — the bound restricts the fetch
    // before consolidation
    "gq_render" -> ((s, dir) =>
      graphite.GraphiteParser.render(
        Vectors.samples(Tables.events(s, dir)),
        """summarize(events.purchase.*, "1d", "sum")""",
        from = "20240105", until = "-12d", nowS = 1705795200L)
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // the render API's maxDataPoints path (render_parser.go:169-177
    // → render.go:171-178): per-name hourly series over a 6-day
    // window (144 points) LTTB-downsampled to 10 — every=15,
    // threshold=10, 8 triangle rounds. Per-user consolidated values
    // quantize to integer micro-units BEFORE the cross-user sum so
    // every triangle area both engines compare derives from exact
    // integers (argmax determinism; the Similarity micro-unit
    // convention)
    // the render API's `offset` form value (render_parser.go:156-166
    // → timespec.go:323 ParseDuration, `-N<unit>` only): the SAME
    // request as gq_render shifted one day into the past — the
    // time-shifted comparison panel idiom
    "gq_render_offset" -> ((s, dir) =>
      graphite.GraphiteParser.renderOffset(
        Vectors.samples(Tables.events(s, dir)),
        """summarize(events.purchase.*, "1d", "sum")""",
        from = "20240105", until = "-12d", nowS = 1705795200L,
        offset = "-1d")
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")),
    // multi-target render (render.go:109-135 request-order targets +
    // :196-207 stable by-name series sort): the response ordering is
    // part of the result — target_idx = request position,
    // series_order = per-target by-path rank
    "gq_render_multi" -> ((s, dir) =>
      graphite.GraphiteParser.renderMulti(
        Vectors.samples(Tables.events(s, dir)),
        Seq("""summarize(events.purchase.*, "1d", "sum")""",
          """events.{click,signup}.*"""),
        from = "20240105", until = "-12d", nowS = 1705795200L)
        .select(col("target_idx"), col("series_order"), col("path"),
          col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("target_idx", "series_order", "bucket_s")),
    "gq_render_lttb" -> ((s, dir) => {
      val f = LttbQ.start
      val u = LttbQ.start + LttbQ.len * LttbQ.step
      val bounded = Vectors.samples(Tables.events(s, dir))
        .where(unix_timestamp(col("ts")) >= f &&
          unix_timestamp(col("ts")) < u)
      val perUser = Graphite.seriesFrame(bounded)
        .withColumn("value", round(col("value") * lit(1e6), 0).cast("long"))
      val byName = Graphite.groupByNode(perUser, 1, "sum")
      graphite.Lttb.downsample(byName, f, u, LttbQ.step, LttbQ.maxDp)
        .select(col("path"), col("bucket_s"),
          round(col("value") / lit(1e6), 6).as("value"))
        .orderBy("path", "bucket_s")
    }),
    // carbon line-protocol roundtrip: render every event as a
    // plaintext `path value epoch` line, parse through the Carbon
    // source, consolidate hourly — the oracle computes the same
    // aggregate from the table directly (parse ∘ render = identity)
    "gr_carbon" -> ((s, dir) => {
      val lines = Vectors.samples(Tables.events(s, dir)).select(
        format_string("%s %s %d",
          concat(lit("events."), col("name"), lit(".user"), col("user_id")),
          col("value"),
          unix_timestamp(col("ts"))).as("line"))
      graft.sources.Carbon.toPathFrame(graft.sources.Carbon.parse(Tables.fan(lines, col("line"))))
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")
    }),
    // the ingester's opt-in path cleanup (rewrite.go copyAndRewrite):
    // dirty rendered paths — leading dot, doubled dots, an invalid
    // '@', a trailing dot — sanitize to the canonical form before
    // consolidation
    "gr_carbon_rewrite" -> ((s, dir) => {
      val lines = Vectors.samples(Tables.events(s, dir)).select(
        format_string("%s %s %d",
          concat(lit(".events."), col("name"), lit("..user@"),
            col("user_id"), lit(".")),
          col("value"),
          unix_timestamp(col("ts"))).as("line"))
      val parsed = graft.sources.Carbon.parse(Tables.fan(lines, col("line")))
        .withColumn("path", graft.sources.Carbon.rewrite(col("path")))
      graft.sources.Carbon.toPathFrame(parsed)
        .select(col("path"), col("bucket_s"), round(col("value"), 6).as("value"))
        .orderBy("path", "bucket_s")
    }),
    // the ingester RULESET (ingest.go:336 write): error metrics hit a
    // raw-write continue rule THEN the match-all; purchase/signup
    // stop at their sum rule (two policies); click/view fall through
    // to the match-all mean — with each policy's retention floored
    // against a fixed now
    "gr_carbon_rules" -> ((s, dir) => {
      import graft.sources.Carbon
      val lines = Vectors.samples(Tables.events(s, dir)).select(
        format_string("%s %s %d",
          concat(lit("events."), col("name"), lit(".user"), col("user_id")),
          col("value"),
          unix_timestamp(col("ts"))).as("line"))
      val rules = Seq(
        Carbon.CarbonRule(contains = Some("error"),
          aggregationEnabled = false, policies = Seq((60L, 604800L)),
          continueMatching = true),
        Carbon.CarbonRule(
          pattern = Some("events\\.(purchase|signup)\\..*"),
          aggregationType = "sum",
          policies = Seq((3600L, 2592000L), (86400L, 7776000L))),
        Carbon.CarbonRule(pattern = Some(".*"),
          aggregationType = "mean", policies = Seq((86400L, 2592000L))))
      Carbon.route(Carbon.parse(Tables.fan(lines, col("line"))), rules, nowS = 1706745600L)
        .select(col("path"), col("rule"), col("agg_type"),
          col("resolution_s"), col("retention_s"), col("bucket_s"),
          round(col("value"), 6).as("value"))
        .orderBy("rule", "resolution_s", "path", "bucket_s")
    })
  )

  val oracles: Map[String, String] = Map(
    "gr_summarize" ->
      s"""SELECT path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT) AS bucket_s,
         | round(sum(value), 6) AS value FROM ($PF) AS p
         | GROUP BY path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gr_moving_avg" ->
      s"""SELECT string_split(path, '.')[2] || '.' || string_split(path, '.')[3] AS path,
         | bucket_s,
         | round(avg(value) OVER (PARTITION BY path ORDER BY bucket_s
         |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS value
         | FROM ($PF) AS p ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gr_per_second" ->
      s"""SELECT path, bucket_s,
         | round(CASE WHEN value - prev_v >= 0 AND bucket_s - prev_b > 0
         |  THEN (value - prev_v) / CAST(bucket_s - prev_b AS DOUBLE) END, 9) AS value
         | FROM (SELECT path, bucket_s, value,
         |  lag(value) OVER w AS prev_v, lag(bucket_s) OVER w AS prev_b
         |  FROM ($PF) AS p WINDOW w AS (PARTITION BY path ORDER BY bucket_s)) AS t
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gr_integral" ->
      s"""SELECT path, bucket_s,
         | round(sum(value) OVER (PARTITION BY path ORDER BY bucket_s
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value
         | FROM ($PF) AS p ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gr_highest" ->
      s"""WITH ranked AS (
         | SELECT path, row_number() OVER (ORDER BY max(value) DESC, path ASC) AS sort_rank
         | FROM ($PF) AS p GROUP BY path)
         | SELECT p.path, p.bucket_s, p.value, r.sort_rank
         | FROM ($PF) AS p JOIN ranked AS r ON p.path = r.path
         | WHERE r.sort_rank <= 5
         | ORDER BY r.sort_rank, p.bucket_s""".stripMargin.replace("\n", " "),
    "gq_sum_last" ->
      s"""SELECT path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT) AS bucket_s,
         | round(arg_max(value, bucket_s), 6) AS value
         | FROM ($PF) AS p
         | WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')
         | GROUP BY path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_moving_xff" ->
      s"""SELECT path, bucket_s,
         | CASE WHEN CAST(count(value) OVER w AS DOUBLE) / 4 >= 0.75
         |  THEN round(avg(value) OVER w, 6) END AS value
         | FROM ($PF) AS p
         | WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')
         | WINDOW w AS (PARTITION BY path ORDER BY bucket_s
         |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    // graphite's GetPercentile: rank = ceil(p/100·(n+1)) clamped to
    // [1, n] over the sorted values — NOT the interpolated quantile
    "gr_npercentile" ->
      s"""WITH s AS (SELECT path, list_sort(list(value)) AS l,
         |   count(value) AS n, avg(value) AS m
         |  FROM ($PF) AS p GROUP BY path),
         | pv AS (SELECT path, round(l[CAST(GREATEST(LEAST(
         |   ceil(0.95 * (n + 1)), n), 1) AS INT)], 6) AS value
         |  FROM s WHERE m > 100.0)
         | SELECT 'nPercentile(' || p.path || ', 95.000)' AS path,
         |  p.bucket_s, pv.value
         | FROM ($PF) AS p JOIN pv ON p.path = pv.path
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gr_group_sum" ->
      s"""SELECT string_split(path, '.')[2] AS path, bucket_s,
         | round(sum(value), 6) AS value FROM ($PF) AS p
         | GROUP BY string_split(path, '.')[2], bucket_s
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gr_combine" ->
      s"""SELECT 'avgSeries' AS path, bucket_s, round(avg(value), 6) AS value
         | FROM ($PF) AS p
         | WHERE NOT regexp_matches(path, '\\.user7$$')
         |  AND path IN (SELECT path FROM ($PF) AS q
         |               GROUP BY path HAVING max(value) > 150.0)
         | GROUP BY bucket_s ORDER BY bucket_s""".stripMargin.replace("\n", " "),
    "gq_expr" ->
      s"""SELECT path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT) AS bucket_s,
         | round(sum(value), 6) AS value FROM ($PF) AS p
         | WHERE NOT regexp_matches(path, 'user7$$')
         | GROUP BY path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_aliases" ->
      s"""WITH pf AS ($PF),
         | su AS (SELECT 'sumSeries' AS path, bucket_s,
         |   abs(sum(value) - 5000) AS value FROM pf
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')
         |  GROUP BY bucket_s),
         | mx AS (SELECT 'maxSeries' AS path, bucket_s,
         |   max(value) AS value FROM pf
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')
         |  GROUP BY bucket_s),
         | mn AS (SELECT 'minSeries' AS path, bucket_s,
         |   min(value) AS value FROM pf
         |  WHERE regexp_matches(path, '^events\\.view\\.[^.]*$$')
         |  GROUP BY bucket_s)
         | SELECT path, bucket_s, round(value, 6) AS value
         | FROM (SELECT * FROM su UNION ALL SELECT * FROM mx
         |       UNION ALL SELECT * FROM mn) AS u
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    // movingMedianHelper takes sorted-window[k/2] (the upper median
    // for even non-null counts), not the midpoint quantile
    "gq_median" ->
      s"""WITH t AS (SELECT path, bucket_s,
         |  CASE WHEN value <= 150 THEN value END AS v
         |  FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | w AS (SELECT path, bucket_s, list_sort(list_filter(
         |   list(v) OVER (PARTITION BY path ORDER BY bucket_s
         |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         |   x -> x IS NOT NULL)) AS ls FROM t)
         | SELECT path, bucket_s,
         |  round(CASE WHEN len(ls) > 0
         |   THEN ls[CAST(len(ls) // 2 AS INT) + 1] END, 6) AS value
         | FROM w ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_percent" ->
      s"""WITH p AS (SELECT path, bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | tot AS (SELECT bucket_s, sum(value) AS t FROM p GROUP BY bucket_s)
         | SELECT p.path, p.bucket_s,
         |  round(CASE WHEN tot.t <> 0 THEN p.value / tot.t END * 100, 6) AS value
         | FROM p JOIN tot ON p.bucket_s = tot.bucket_s
         | ORDER BY p.path, p.bucket_s""".stripMargin.replace("\n", " "),
    "gq_hitcount" ->
      s"""WITH p AS (SELECT path, bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$'))
         | SELECT path, (bucket_s // 86400) * 86400 AS bucket_s,
         |  round(sum(value * 3600), 6) AS value
         | FROM p GROUP BY path, (bucket_s // 86400) * 86400
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_integral_by" ->
      s"""WITH p AS (SELECT path, bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$'))
         | SELECT path, bucket_s,
         |  round(sum(value) OVER (PARTITION BY path, bucket_s // 86400
         |   ORDER BY bucket_s ROWS UNBOUNDED PRECEDING), 6) AS value
         | FROM p ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_shift_chain" ->
      s"""WITH p AS (SELECT path, bucket_s + 86400 AS bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | d AS (SELECT path, bucket_s,
         |  value - lag(value) OVER (PARTITION BY path ORDER BY bucket_s) AS dv
         |  FROM p)
         | SELECT path, bucket_s,
         |  round(abs((CASE WHEN dv >= 0 THEN dv END) - 5), 6) AS value
         | FROM d ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_keeplast" ->
      s"""WITH p AS (SELECT path, bucket_s,
         |  CASE WHEN value <= 120 THEN value END AS v FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | k AS (SELECT path, bucket_s, coalesce(v,
         |   last_value(v IGNORE NULLS) OVER (PARTITION BY path ORDER BY bucket_s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS v FROM p)
         | SELECT path, bucket_s, round(coalesce(v, -1), 6) AS value
         | FROM k ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gr_diff" ->
      s"""WITH p AS (SELECT path, bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | fp AS (SELECT min(path) AS f FROM p)
         | SELECT 'diffSeries' AS path, bucket_s,
         |  round(sum(CASE WHEN p.path = fp.f THEN value ELSE -value END), 6) + 0.0 AS value
         | FROM p CROSS JOIN fp GROUP BY bucket_s
         | ORDER BY bucket_s""".stripMargin.replace("\n", " "),
    "gr_spread" ->
      s"""WITH p AS (SELECT path, bucket_s, value * 0.01 AS value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.[^.]*\\.user42$$'))
         | SELECT * FROM (
         |  SELECT 'rangeSeries' AS path, bucket_s,
         |   round(max(value) - min(value), 6) AS value FROM p GROUP BY bucket_s
         |  UNION ALL SELECT 'stddevSeries' AS path, bucket_s,
         |   round(stddev_pop(value), 6) AS value FROM p GROUP BY bucket_s
         |  UNION ALL SELECT 'multiplySeries' AS path, bucket_s,
         |   round(product(value), 6) AS value FROM p GROUP BY bucket_s
         |  UNION ALL SELECT 'percentileOfSeries' AS path, bucket_s,
         |   round(l[CAST(GREATEST(LEAST(ceil(0.9 * (n + 1)), n), 1) AS INT)], 6)
         |    AS value FROM (SELECT bucket_s, list_sort(list(value)) AS l,
         |     count(value) AS n FROM p GROUP BY bucket_s) AS ps
         | ) AS u ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gr_sort_total" ->
      s"""WITH p AS (SELECT path, bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | r AS (SELECT path, row_number() OVER
         |   (ORDER BY sum(value) DESC, path ASC) AS sort_rank
         |  FROM p GROUP BY path)
         | SELECT p.path, p.bucket_s, round(p.value, 6) AS value, r.sort_rank
         | FROM p JOIN r USING (path)
         | ORDER BY r.sort_rank, p.bucket_s""".stripMargin.replace("\n", " "),
    "gr_weighted" ->
      s"""WITH v AS (SELECT string_split(path, '.')[3] AS k, bucket_s, value
         |   FROM ($PF) AS f
         |   WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | w AS (SELECT string_split(path, '.')[3] AS k, bucket_s, value
         |   FROM ($PF) AS f
         |   WHERE regexp_matches(path, '^events\\.view\\.[^.]*$$'))
         | SELECT 'weightedAverage' AS path, v.bucket_s,
         |  round(sum(v.value * w.value) /
         |   (CASE WHEN sum(w.value) <> 0 THEN sum(w.value) END), 6) AS value
         | FROM v JOIN w ON v.k = w.k AND v.bucket_s = w.bucket_s
         | GROUP BY v.bucket_s ORDER BY v.bucket_s""".stripMargin.replace("\n", " "),
    "gr_ema" ->
      s"""WITH RECURSIVE o AS (
         |  SELECT path, bucket_s, value,
         |   row_number() OVER (PARTITION BY path ORDER BY bucket_s) AS rn
         |  FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.user1[^.]*$$')),
         | seed AS (SELECT path, avg(value) AS ema FROM o WHERE rn <= 5 GROUP BY path),
         | rec AS (
         |  SELECT o.path, o.rn, o.bucket_s, s.ema AS ema, round(s.ema, 6) AS outv
         |  FROM o JOIN seed AS s USING (path) WHERE o.rn = 1
         |  UNION ALL
         |  SELECT o.path, o.rn, o.bucket_s,
         |   (CAST(2 AS DOUBLE)/6) * o.value + (1 - CAST(2 AS DOUBLE)/6) * r.ema,
         |   round((CAST(2 AS DOUBLE)/6) * o.value + (1 - CAST(2 AS DOUBLE)/6) * r.ema, 6)
         |  FROM rec AS r JOIN o ON o.path = r.path AND o.rn = r.rn + 1)
         | SELECT path, bucket_s, round(outv, 6) + 0.0 AS value FROM rec
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_wild" ->
      s"""SELECT 'events.' || string_split(path, '.')[2] AS path, bucket_s,
         | round(sum(value), 6) AS value FROM ($PF) AS f
         | WHERE regexp_matches(path, '^events\\.[^.]*\\.user4[^.]*$$')
         | GROUP BY string_split(path, '.')[2], bucket_s
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_moving2" ->
      s"""SELECT path, bucket_s, round(
         |  sum(lv) OVER (PARTITION BY path ORDER BY bucket_s
         |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS value
         | FROM (SELECT path, bucket_s,
         |  lag(value, 2) OVER (PARTITION BY path ORDER BY bucket_s) AS lv
         |  FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')) AS t
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_changed" ->
      s"""SELECT path, bucket_s,
         | CASE WHEN v IS NOT NULL AND pnn IS NOT NULL AND v <> pnn
         |  THEN 1.0 ELSE 0.0 END AS value
         | FROM (SELECT path, bucket_s, v,
         |  last_value(v IGNORE NULLS) OVER (PARTITION BY path ORDER BY bucket_s
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pnn
         |  FROM (SELECT path, bucket_s,
         |   CASE WHEN value <= 130 THEN value END AS v FROM ($PF) AS f
         |   WHERE regexp_matches(path, '^events\\.view\\.[^.]*$$')) AS a) AS b
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_slice" ->
      s"""WITH p AS (SELECT path, bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | mn AS (SELECT min(bucket_s) AS m FROM p)
         | SELECT path,
         |  CAST(mn.m + floor((p.bucket_s - mn.m) / 21600) * 21600 AS BIGINT) AS bucket_s,
         |  round(max(CASE WHEN p.bucket_s BETWEEN 1704844800 AND 1705708800
         |   THEN value END), 2) AS value
         | FROM p CROSS JOIN mn
         | GROUP BY path, CAST(mn.m + floor((p.bucket_s - mn.m) / 21600) * 21600 AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_hw" ->
      s"""WITH RECURSIVE o AS (
         |  SELECT path, bucket_s, value,
         |   row_number() OVER (PARTITION BY path ORDER BY bucket_s) AS rn
         |  FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.user1[^.]*$$')),
         | rec AS (
         |  SELECT DISTINCT path, CAST(0 AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS bucket_s,
         |   CAST(NULL AS DOUBLE) AS value, CAST(NULL AS DOUBLE) AS icept,
         |   CAST(0 AS DOUBLE) AS slope, CAST(NULL AS DOUBLE) AS next_pred,
         |   CAST([] AS DOUBLE[]) AS seasonals, CAST([] AS DOUBLE[]) AS devs,
         |   CAST(NULL AS DOUBLE) AS pred
         |  FROM o
         |  UNION ALL
         |  SELECT o.path, o.rn, o.bucket_s, o.value,
         |   CASE WHEN o.value IS NULL THEN NULL ELSE
         |    CAST(0.1 AS DOUBLE)*(o.value - ls.last_seasonal)
         |    + (1-CAST(0.1 AS DOUBLE))*(ls.last_icept + ls.last_slope) END,
         |   CASE WHEN o.value IS NULL THEN CAST(0 AS DOUBLE) ELSE
         |    CAST(0.0035 AS DOUBLE)*((CAST(0.1 AS DOUBLE)*(o.value - ls.last_seasonal)
         |     + (1-CAST(0.1 AS DOUBLE))*(ls.last_icept + ls.last_slope)) - ls.last_icept)
         |    + (1-CAST(0.0035 AS DOUBLE))*ls.last_slope END,
         |   CASE WHEN o.value IS NULL THEN NULL ELSE
         |    (CAST(0.1 AS DOUBLE)*(o.value - ls.last_seasonal)
         |     + (1-CAST(0.1 AS DOUBLE))*(ls.last_icept + ls.last_slope))
         |    + (CAST(0.0035 AS DOUBLE)*((CAST(0.1 AS DOUBLE)*(o.value - ls.last_seasonal)
         |      + (1-CAST(0.1 AS DOUBLE))*(ls.last_icept + ls.last_slope)) - ls.last_icept)
         |     + (1-CAST(0.0035 AS DOUBLE))*ls.last_slope)
         |    + ls.next_last_seasonal END,
         |   list_append(r.seasonals, CASE WHEN o.value IS NULL THEN CAST(0 AS DOUBLE) ELSE
         |    CAST(0.1 AS DOUBLE)*(o.value - (CAST(0.1 AS DOUBLE)*(o.value - ls.last_seasonal)
         |     + (1-CAST(0.1 AS DOUBLE))*(ls.last_icept + ls.last_slope)))
         |    + (1-CAST(0.1 AS DOUBLE))*ls.last_seasonal END),
         |   list_append(r.devs, CASE WHEN o.value IS NULL THEN CAST(0 AS DOUBLE) ELSE
         |    CAST(0.1 AS DOUBLE)*abs(o.value - coalesce(ls.prediction, CAST(0 AS DOUBLE)))
         |    + (1-CAST(0.1 AS DOUBLE))*ls.last_dev END),
         |   ls.prediction
         |  FROM rec AS r
         |  JOIN o ON o.path = r.path AND o.rn = r.rn + 1
         |  CROSS JOIN LATERAL (SELECT
         |    CASE WHEN o.rn >= 25 THEN r.seasonals[o.rn - 24]
         |     ELSE CAST(0 AS DOUBLE) END AS last_seasonal,
         |    CASE WHEN o.rn >= 24 THEN r.seasonals[o.rn - 23]
         |     ELSE CAST(0 AS DOUBLE) END AS next_last_seasonal,
         |    CASE WHEN o.rn >= 25 THEN r.devs[o.rn - 24]
         |     ELSE CAST(0 AS DOUBLE) END AS last_dev,
         |    coalesce(r.icept, o.value) AS last_icept,
         |    r.slope AS last_slope,
         |    CASE WHEN o.rn = 1 THEN o.value ELSE r.next_pred END AS prediction) AS ls)
         | SELECT path, bucket_s, round(pred, 6) + 0.0 AS value FROM rec
         | WHERE rn >= 1 ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_legend" ->
      s"""WITH p AS (SELECT path, bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | qual AS (SELECT replace(path, 'purchase', 'click') AS path
         |  FROM (SELECT path, max(value) AS mx FROM p GROUP BY path) AS t
         |  WHERE mx > 195),
         | sel AS (SELECT f.path, f.bucket_s, f.value FROM ($PF) AS f
         |  JOIN qual USING (path)),
         | red AS (SELECT path, max(value) AS mx FROM sel GROUP BY path)
         | SELECT sel.path || ' (max: ' || printf('%.3f', red.mx) || ')' AS path,
         |  sel.bucket_s, round(sel.value, 6) AS value
         | FROM sel JOIN red USING (path)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_cacti" ->
      s"""WITH f AS (SELECT path, bucket_s, value FROM ($PF) AS p
         |  WHERE regexp_matches(path, '^events\\.signup\\.user1[^.]$$')),
         | stats AS (SELECT path, arg_max(value, bucket_s) AS lastv,
         |  max(value) AS mx, min(value) AS mn FROM f GROUP BY path),
         | w AS (SELECT max(length(path)) AS wn,
         |  max(length(CAST(CAST(trunc(lastv) AS BIGINT) AS VARCHAR)) + 3) AS wl,
         |  max(length(CAST(CAST(trunc(mx) AS BIGINT) AS VARCHAR)) + 3) AS wx,
         |  max(length(CAST(CAST(trunc(mn) AS BIGINT) AS VARCHAR)) + 3) AS wm
         |  FROM stats)
         | SELECT rpad(f.path, CAST(w.wn AS INT), ' ') ||
         |  ' Current:' || rpad(printf('%.2f', s.lastv), CAST(w.wl AS INT), ' ') ||
         |  ' Max:' || rpad(printf('%.2f', s.mx), CAST(w.wx AS INT), ' ') ||
         |  ' Min:' || rpad(printf('%.2f', s.mn), CAST(w.wm AS INT), ' ') || ' ' AS path,
         |  f.bucket_s, round(f.value, 6) AS value
         | FROM f JOIN stats AS s USING (path) CROSS JOIN w
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_apply" ->
      s"""SELECT 'events.' || string_split(path, '.')[2] || '.total' AS path,
         | bucket_s, round(sum(value), 6) AS value FROM ($PF) AS f
         | GROUP BY string_split(path, '.')[2], bucket_s
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_find" ->
      s"""SELECT id, text, CAST(max(leaf) AS INT) AS is_leaf,
         | CAST(max(1 - leaf) AS INT) AS has_children FROM (
         | SELECT array_to_string(string_split(path, '.')[1:2], '.') AS id,
         |  string_split(path, '.')[2] AS text,
         |  CASE WHEN len(string_split(path, '.')) = 2 THEN 1 ELSE 0 END AS leaf
         | FROM (SELECT DISTINCT path FROM ($PF) AS f) AS p
         | WHERE regexp_matches(path, '^events\\.[^.]*(\\..*)?$$')
         | ) AS u GROUP BY id, text ORDER BY id""".stripMargin.replace("\n", " "),
    "gq_find_range" ->
      s"""SELECT id, text, CAST(max(leaf) AS INT) AS is_leaf,
         | CAST(max(1 - leaf) AS INT) AS has_children FROM (
         | SELECT array_to_string(string_split(path, '.')[1:3], '.') AS id,
         |  string_split(path, '.')[3] AS text,
         |  CASE WHEN len(string_split(path, '.')) = 3 THEN 1 ELSE 0 END AS leaf
         | FROM (SELECT DISTINCT 'events.' || event_type || '.user' ||
         |   CAST(user_id AS VARCHAR) AS path FROM events
         |  WHERE CAST(floor(epoch(ts)) AS BIGINT) >= 1704412800
         |   AND CAST(floor(epoch(ts)) AS BIGINT) < 1704585600) AS p
         | WHERE regexp_matches(path,
         |  '^events\\.+purchase\\.+[^.]*(\\..*)?$$')
         | ) AS u GROUP BY id, text ORDER BY id""".stripMargin.replace("\n", " "),
    "gq_find_leaf" ->
      s"""SELECT id, text, CAST(max(leaf) AS INT) AS is_leaf,
         | CAST(max(1 - leaf) AS INT) AS has_children FROM (
         | SELECT array_to_string(string_split(path, '.')[1:3], '.') AS id,
         |  string_split(path, '.')[3] AS text,
         |  CASE WHEN len(string_split(path, '.')) = 3 THEN 1 ELSE 0 END AS leaf
         | FROM (SELECT DISTINCT path FROM ($PF) AS f) AS p
         | WHERE regexp_matches(path, '^events\\.purchase\\.user1[^.](\\..*)?$$')
         | ) AS u GROUP BY id, text ORDER BY id""".stripMargin.replace("\n", " "),
    "gq_glob_brace" ->
      s"""SELECT path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT) AS bucket_s,
         | round(sum(value), 6) AS value FROM ($PF) AS p
         | WHERE regexp_matches(path, '^events\\.(purchase|signup)\\.[^.]*$$')
         | GROUP BY path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_glob_range" ->
      s"""SELECT path, bucket_s, round(value, 6) AS value FROM ($PF) AS p
         | WHERE regexp_matches(path, '^events\\.[^.]*\\.user[0-2][^.]$$')
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    // [from=2024-01-05, until=now-12d=2024-01-09) — midnight-aligned
    // bounds, so filtering the hourly frame on bucket_s equals
    // filtering raw ts before consolidation
    "gq_render" ->
      s"""SELECT path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT) AS bucket_s,
         | round(sum(value), 6) AS value FROM ($PF) AS p
         | WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')
         |  AND bucket_s >= 1704412800 AND bucket_s < 1704758400
         | GROUP BY path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    // gq_render's window shifted −1d: [2024-01-04, 2024-01-08)
    "gq_render_offset" ->
      s"""SELECT path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT) AS bucket_s,
         | round(sum(value), 6) AS value FROM ($PF) AS p
         | WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')
         |  AND bucket_s >= 1704326400 AND bucket_s < 1704672000
         | GROUP BY path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    // two targets in request order; dense by-path rank within each
    "gq_render_multi" ->
      s"""WITH t0 AS (
         |  SELECT 0 AS target_idx, path,
         |   CAST(floor(bucket_s / 86400) * 86400 AS BIGINT) AS bucket_s,
         |   round(sum(value), 6) AS value FROM ($PF) AS p
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')
         |   AND bucket_s >= 1704412800 AND bucket_s < 1704758400
         |  GROUP BY path, CAST(floor(bucket_s / 86400) * 86400 AS BIGINT)),
         | t1 AS (
         |  SELECT 1 AS target_idx, path, bucket_s, round(value, 6) AS value
         |  FROM ($PF) AS p
         |  WHERE regexp_matches(path, '^events\\.(click|signup)\\.[^.]*$$')
         |   AND bucket_s >= 1704412800 AND bucket_s < 1704758400),
         | u AS (SELECT * FROM t0 UNION ALL SELECT * FROM t1),
         | o AS (SELECT target_idx, path,
         |   dense_rank() OVER (PARTITION BY target_idx ORDER BY path)
         |    AS series_order
         |  FROM (SELECT DISTINCT target_idx, path FROM u) AS d)
         | SELECT u.target_idx, o.series_order, u.path, u.bucket_s, u.value
         | FROM u JOIN o ON u.target_idx = o.target_idx AND u.path = o.path
         | ORDER BY u.target_idx, o.series_order, u.bucket_s""".stripMargin.replace("\n", " "),
    "gq_render_lttb" -> LttbQ.sql.replace("\n", " "),
    "gq_find_matchall" ->
      s"""SELECT DISTINCT 'events.' || seg AS id, seg AS text,
         | CAST(0 AS INT) AS is_leaf,
         | CAST(1 AS INT) AS has_children FROM (
         |  SELECT string_split(path, '.')[2] AS seg
         |   FROM (SELECT DISTINCT path FROM ($PF) AS f) AS p
         |  UNION
         |  SELECT string_split(path, '.')[3] AS seg
         |   FROM (SELECT DISTINCT path FROM ($PF) AS g) AS q
         | ) AS u ORDER BY id""".stripMargin.replace("\n", " "),
    "gr_carbon" ->
      s"""SELECT 'events.' || event_type || '.user' || CAST(user_id AS VARCHAR) AS path,
         | CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_s,
         | round(avg(value), 6) AS value
         | FROM events
         | GROUP BY path, CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    // rewrite(.events.<t>..user@<id>.) = events.<t>.user_<id>
    "gr_carbon_rewrite" ->
      s"""SELECT 'events.' || event_type || '.user_' || CAST(user_id AS VARCHAR) AS path,
         | CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_s,
         | round(avg(value), 6) AS value
         | FROM events
         | GROUP BY path, CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT)
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    // rule replay: applied(0)=contains error (continue), applied(1)=
    // purchase|signup (stop), applied(2)=NOT matched-by-1; retention
    // floors against now=1706745600
    "gr_carbon_rules" ->
      s"""WITH p AS (
         | SELECT 'events.' || event_type || '.user' || CAST(user_id AS VARCHAR) AS path,
         |  CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events),
         |m AS (SELECT path, es, value,
         |  (position('error' IN path) > 0) AS m0,
         |  regexp_matches(path, 'events\\.(purchase|signup)\\..*') AS m1
         | FROM p)
         |SELECT * FROM (
         | SELECT path, CAST(0 AS INT) AS rule, 'raw' AS agg_type,
         |  CAST(60 AS BIGINT) AS resolution_s,
         |  CAST(604800 AS BIGINT) AS retention_s,
         |  es AS bucket_s, round(value, 6) AS value FROM m WHERE m0
         | UNION ALL
         | SELECT path, CAST(1 AS INT), 'sum', CAST(3600 AS BIGINT),
         |  CAST(2592000 AS BIGINT),
         |  CAST(floor(es / 3600) * 3600 AS BIGINT), round(sum(value), 6)
         |  FROM m WHERE m1
         |  GROUP BY path, CAST(floor(es / 3600) * 3600 AS BIGINT)
         | UNION ALL
         | SELECT path, CAST(1 AS INT), 'sum', CAST(86400 AS BIGINT),
         |  CAST(7776000 AS BIGINT),
         |  CAST(floor(es / 86400) * 86400 AS BIGINT), round(sum(value), 6)
         |  FROM m WHERE m1
         |  GROUP BY path, CAST(floor(es / 86400) * 86400 AS BIGINT)
         | UNION ALL
         | SELECT path, CAST(2 AS INT), 'mean', CAST(86400 AS BIGINT),
         |  CAST(2592000 AS BIGINT),
         |  CAST(floor(es / 86400) * 86400 AS BIGINT), round(avg(value), 6)
         |  FROM m WHERE NOT m1
         |  GROUP BY path, CAST(floor(es / 86400) * 86400 AS BIGINT)
         |) AS u WHERE bucket_s >= 1706745600 - retention_s
         |ORDER BY rule, resolution_s, path, bucket_s"""
        .stripMargin.replace("\n", " "),
    "gq_expr2" ->
      s"""WITH m AS (SELECT path, bucket_s,
         |  avg(value) OVER (PARTITION BY path ORDER BY bucket_s
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS value
         |  FROM ($PF) AS p
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | top AS (SELECT path FROM (
         |  SELECT path, row_number() OVER (ORDER BY max(value) DESC, path ASC) AS rk
         |  FROM m GROUP BY path) AS t WHERE rk <= 2)
         | SELECT string_split(m.path, '.')[2] || '.' || string_split(m.path, '.')[3] AS path,
         |  bucket_s, round(value, 6) AS value
         | FROM m JOIN top ON m.path = top.path
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " ")
  )
}
