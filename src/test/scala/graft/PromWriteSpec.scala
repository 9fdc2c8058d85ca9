package graft

import org.apache.spark.sql.functions._
import graft.sources.PromWrite
import graft.tsdb.{Downsample, Fetch}

/** Prometheus remote-write semantics, tracking the reference handler
  * (src/query/api/v1/handler/prometheus/remote/write.go parseRequest
  * + map_tags.go mapTags) and the coordinator routing
  * (src/cmd/services/m3coordinator/ingest/write.go shouldWrite /
  * shouldDownsample): label-set validation per models/tags.go:286,
  * the `write` tag-mapper upsert, header-driven write options, and
  * the two-path downsample-and-write fan-out. */
class PromWriteSpec extends SparkSpec {

  private def req(rows: (Seq[(String, String)], Long, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq
      .toDF("raw", "ts_s", "value")
      .select(
        expr("transform(raw, p -> struct(p._1 AS name, p._2 AS value))")
          .as("labels"),
        timestamp_seconds(col("ts_s")).as("ts"), col("value"))
  }

  private def parseAll(df: org.apache.spark.sql.DataFrame) =
    PromWrite.parse(df).collect().map { r =>
      (Option(r.getString(0)),
        Option(r.getMap[String, String](1)).map(_.toMap),
        r.getBoolean(r.fieldIndex("malformed")))
    }

  test("__name__ becomes the metric name, other labels the tags") {
    val rows = parseAll(req(
      (Seq("__name__" -> "http_requests", "job" -> "api", "le" -> "0.5"),
        1704067200L, 1.0)))
    assert(rows.toSeq == Seq((Some("http_requests"),
      Some(Map("job" -> "api", "le" -> "0.5")), false)))
  }

  test("label order is irrelevant; missing __name__ is a null name") {
    // newTSPromIter sorts before validation (write.go:431)
    val rows = parseAll(req(
      (Seq("z" -> "1", "a" -> "2", "__name__" -> "m"), 0L, 1.0),
      (Seq("job" -> "api"), 0L, 2.0)))
    assert(rows(0) == ((Some("m"), Some(Map("z" -> "1", "a" -> "2")), false)))
    // tags.validate does not require a name tag — valid, name null
    assert(rows(1) == ((None, Some(Map("job" -> "api")), false)))
  }

  test("label-set validation flags per models/tags.go rules") {
    val rows = parseAll(req(
      (Seq.empty, 0L, 1.0),                                  // no tags
      (Seq("" -> "v"), 0L, 1.0),                             // empty name
      (Seq("a" -> ""), 0L, 1.0),                             // empty value
      (Seq("a" -> "1", "a" -> "2"), 0L, 1.0),                // duplicate
      (Seq("a" -> ("x" * 65536)), 0L, 1.0),                  // too long
      (Seq("a" -> ("x" * 65535)), 0L, 1.0)))                 // at the limit
    assert(rows.map(_._3).toSeq ==
      Seq(true, true, true, true, true, false))
    // flagged sets carry null tags (map_from_entries must not throw)
    assert(rows(3)._2.isEmpty)
  }

  test("write tag-mapper upserts on every series (map_tags.go:41)") {
    val mapped = PromWrite.mapTags(req(
      (Seq("__name__" -> "m", "dc" -> "west"), 0L, 1.0),
      (Seq("__name__" -> "m", "job" -> "api"), 0L, 2.0)),
      Seq(PromWrite.WriteTag("dc", "east")))
    val rows = parseAll(mapped)
    assert(rows(0)._2.contains(Map("dc" -> "east")))           // replaced
    assert(rows(1)._2.contains(Map("job" -> "api", "dc" -> "east"))) // appended
    // a mapper can repair an invalid set (runs before validation)
    val repaired = parseAll(PromWrite.mapTags(
      req((Seq("__name__" -> "m", "dc" -> ""), 0L, 1.0)),
      Seq(PromWrite.WriteTag("dc", "east"))))
    assert(!repaired(0)._3)
    // the other three ops throw exactly like the reference
    intercept[UnsupportedOperationException](
      PromWrite.mapTags(req(), Seq(PromWrite.DropTag("a"))))
    intercept[UnsupportedOperationException](
      PromWrite.mapTags(req(), Seq(PromWrite.DropTagWithValue("a", "b"))))
    intercept[UnsupportedOperationException](
      PromWrite.mapTags(req(), Seq(PromWrite.ReplaceTag("a", "b", "c"))))
  }

  test("prom type header stamps every series; unknown rejects") {
    val typed = PromWrite.withPromType(req((Seq("__name__" -> "m"), 0L, 1.0)),
      "Counter")
    assert(typed.select("metric_type").head.getString(0) == "counter")
    intercept[IllegalArgumentException](
      PromWrite.withPromType(req(), "nope"))
  }

  test("header options replay parseRequest (write.go:440-486)") {
    // no headers: default rules + default policies
    val def0 = PromWrite.headerOptions()
    assert(!def0.downsampleOverride && !def0.writeOverride)
    // unaggregated: direct writes only, a policy is an error
    val un = PromWrite.headerOptions(metricsType = Some("unaggregated"))
    assert(un.downsampleOverride && un.downsampleMappingRules.isEmpty)
    assert(!un.writeOverride)
    intercept[IllegalArgumentException](PromWrite.headerOptions(
      metricsType = Some("unaggregated"), storagePolicy = Some("1h:30d")))
    // aggregated: the parsed policy pins the write
    val ag = PromWrite.headerOptions(metricsType = Some("aggregated"),
      storagePolicy = Some("1h:30d"))
    assert(ag.downsampleOverride && ag.writeOverride &&
      ag.writeStoragePolicies ==
        Seq(PromWrite.StoragePolicy("1h", 30L * 86400L)))
    intercept[IllegalArgumentException](
      PromWrite.headerOptions(metricsType = Some("aggregated")))
    intercept[IllegalArgumentException](
      PromWrite.headerOptions(metricsType = Some("bogus")))
    // aggregate write type clears the direct path
    val aw = PromWrite.headerOptions(writeType = Some("aggregate"))
    assert(aw.writeOverride && aw.writeStoragePolicies.isEmpty)
    assert(PromWrite.headerOptions(writeType = Some("default")) ==
      PromWrite.WriteOptions())
    intercept[IllegalArgumentException](
      PromWrite.headerOptions(writeType = Some("nope")))
  }

  test("routing predicates match ingest/write.go:210,238") {
    val def0 = PromWrite.WriteOptions()
    assert(PromWrite.shouldWrite(def0) && PromWrite.shouldDownsample(def0))
    assert(!PromWrite.shouldWrite(def0, storeExists = false))
    assert(!PromWrite.shouldDownsample(def0, downsamplerEnabled = false))
    // override with zero policies/rules disables the path; with ≥1 keeps it
    val aw = PromWrite.headerOptions(writeType = Some("aggregate"))
    assert(!PromWrite.shouldWrite(aw) && PromWrite.shouldDownsample(aw))
    val un = PromWrite.headerOptions(metricsType = Some("unaggregated"))
    assert(PromWrite.shouldWrite(un) && !PromWrite.shouldDownsample(un))
    val ag = PromWrite.headerOptions(metricsType = Some("aggregated"),
      storagePolicy = Some("10m:2d"))
    assert(PromWrite.shouldWrite(ag) && !PromWrite.shouldDownsample(ag))
  }

  test("writeBatch fans out to both paths with attribution") {
    val s = spark
    import s.implicits._
    val samples = Seq(("m", 1L, 0L, 1.0), ("m", 1L, 3600L, 3.0))
      .toDF("name", "user_id", "ts_s", "value")
      .select(col("name"), col("user_id"),
        timestamp_seconds(col("ts_s")).as("ts"), col("value"),
        monotonically_increasing_id().as("event_id"))
    val rules = Seq(Downsample.Rule("all_hourly",
      Seq(Fetch.Matcher("name", Fetch.Re, ".*")), "hour", Seq("sum")))

    // defaults: raw rows tagged unaggregated + the rollup
    val r0 = PromWrite.writeBatch(samples, PromWrite.WriteOptions(), rules)
    assert(r0.unaggregated.count() == 2 &&
      r0.unaggregated.select("policy").distinct().head.getString(0) ==
        "unaggregated")
    assert(r0.downsampled.count() == 2) // two hourly buckets × one agg

    // aggregated metrics-type: direct write once per policy, no rollup
    val ag = PromWrite.headerOptions(metricsType = Some("aggregated"),
      storagePolicy = Some("1h:30d"))
    val r1 = PromWrite.writeBatch(samples, ag, rules)
    assert(r1.unaggregated.select("policy").distinct().head.getString(0) ==
      "1h:2592000s")
    assert(r1.downsampled.count() == 0)

    // aggregate write-type: rollup only
    val r2 = PromWrite.writeBatch(samples,
      PromWrite.headerOptions(writeType = Some("aggregate")), rules)
    assert(r2.unaggregated.count() == 0 && r2.downsampled.count() == 2)

    // downsample override rules win over defaults
    val ov = PromWrite.WriteOptions(downsampleOverride = true,
      downsampleMappingRules = Seq(Downsample.Rule("daily",
        Seq(Fetch.Matcher("name", Fetch.Re, ".*")), "day", Seq("count"))))
    val r3 = PromWrite.writeBatch(samples, ov, rules)
    assert(r3.downsampled.select("rule").distinct().head.getString(0) ==
      "daily")
  }
}
