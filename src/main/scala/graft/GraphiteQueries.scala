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
      Graphite.sortByMaxima(Graphite.highestMax(frame(s, dir), 5))
        .select(col("path"), col("bucket_s"), col("value"),
          col("sort_rank").cast("long").as("sort_rank"))
        .orderBy("sort_rank", "bucket_s")),
    "gr_npercentile" -> ((s, dir) =>
      Graphite.nPercentile(Graphite.averageAbove(frame(s, dir), 100.0), 95.0)
        .select(col("path"), round(col("value"), 6).as("value"))
        .orderBy("path")),
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
        .orderBy("path", "bucket_s"))
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
    "gr_npercentile" ->
      s"""SELECT path, round(quantile_cont(value, 0.95), 6) AS value
         | FROM ($PF) AS p
         | GROUP BY path HAVING avg(value) > 100.0
         | ORDER BY path""".stripMargin.replace("\n", " "),
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
    "gq_median" ->
      s"""SELECT path, bucket_s,
         | round(quantile_cont(v, 0.5) OVER (PARTITION BY path ORDER BY bucket_s
         |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS value
         | FROM (SELECT path, bucket_s,
         |  CASE WHEN value <= 150 THEN value END AS v
         |  FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')) AS t
         | ORDER BY path, bucket_s""".stripMargin.replace("\n", " "),
    "gq_percent" ->
      s"""WITH p AS (SELECT path, bucket_s, value FROM ($PF) AS f
         |  WHERE regexp_matches(path, '^events\\.purchase\\.[^.]*$$')),
         | tot AS (SELECT bucket_s, sum(value) AS t FROM p GROUP BY bucket_s)
         | SELECT p.path, p.bucket_s,
         |  round(CASE WHEN tot.t <> 0 THEN p.value / tot.t END * 100, 6) AS value
         | FROM p JOIN tot ON p.bucket_s = tot.bucket_s
         | ORDER BY p.path, p.bucket_s""".stripMargin.replace("\n", " "),
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
