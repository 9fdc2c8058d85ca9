package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup pipeline (not part of the
  * driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    Sessions.tune(spark)
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    t("docs.count")(docs.count())
    t("words.explode")(docs.select(explode(split(lower(col("text")), "\\s+"))).count())
    t("shingles")(pipeline.Dedup.shingles(docs).count())
    t("shingles+md5")(pipeline.Dedup.shingles(docs)
      .select(pipeline.Dedup.md5Int(col("shingle"))).count())
    t("shingles_materialized") {
      val ws = docs.select(col("doc_id"), split(lower(col("text")), "\\s+").as("ws"))
      ws.select(col("doc_id"), explode(array_distinct(filter(
        transform(col("ws"), (_, i) =>
          when(i <= size(col("ws")) - 3,
            concat_ws(" ", element_at(col("ws"), i + 1),
              element_at(col("ws"), i + 2), element_at(col("ws"), i + 3)))),
        _.isNotNull))).as("shingle")).count()
    }
    t("minhash_sig")(pipeline.Dedup.minhashSignature(docs, 16).count())
    t("simhash")(pipeline.Dedup.simhash(docs).count())
    // bigram-LM stage breakdown (ws projected first — see
    // TextAnalysis.bigramCrossEntropy)
    val base = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("ws"))
    val n = size(col("ws"))
    val bigrams = when(n >= 2,
      transform(sequence(lit(1), n - 1),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1))))
      .otherwise(array().cast("array<string>"))
    t("bigram.explode")(base.select(col("doc_id"), explode(bigrams).as("bg")).count())
    val tfd = base.select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("tf"))
    t("bigram.tfd")(tfd.count())
    t("bigram.c12")(tfd.groupBy("bg").agg(sum("tf")).count())
    t("bigram.full") {
      val df = pipeline.TextAnalysis.bigramCrossEntropy(docs)
      df.write.format("noop").mode("overwrite").save(); df.count()
    }
    // range-door A/B: the direct per-sample expansion vs the
    // two-phase cell composition — the testdata (sparse per cell:
    // cells ≈ samples, the paths should tie) and a DENSE synthetic
    // (100 series at 5 s cadence for a day = 6 samples per 30 s cell;
    // [1h] windows at 30 s step = 120 cells/window — the cell path
    // should win by ≈ the per-cell density)
    if (sys.env.contains("SPARK_GRAFT_RANGE_AB")) {
      val sparse = tsdb.Vectors.samples(Tables.events(spark, sfDir))
        .where(col("name") === "purchase")
      val dense = spark.range(0, 1728000L).select(
        lit("m").as("name"), (col("id") % 100).as("user_id"),
        timestamp_seconds(lit(1704240000L) + (col("id") / 100) * 5).as("ts"),
        (col("id") % 97).cast("double").as("value"), col("id").as("event_id"))
        .localCheckpoint(true)
      val rc = promql.PromQL.RangeCtx(1704240000L, 1704326400L, 30L, 300L)
      for ((tag, in, rangeS) <- Seq(("sparse_1d", sparse, 86400L),
                                    ("dense_1h", dense, 3600L));
           fn <- Seq("rate", "sum_over_time");
           mode <- Seq("direct", "cells")) {
        val t0 = System.nanoTime()
        val df =
          if (mode == "direct")
            promql.PromQL.gridWindowDirect(fn, in, rangeS, rc, Nil)
          else promql.PromQL.gridWindowCells(fn, in, rangeS, rc)
        df.write.format("noop").mode("overwrite").save()
        println(f"PROFILE range_${tag}_$fn%-14s $mode%-7s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        if (sys.env.contains("SPARK_GRAFT_RANGE_AB_PLAN") &&
            fn == "sum_over_time" && tag == "sparse_1d")
          println(df.queryExecution.executedPlan.toString)
      }
    }
    println(pipeline.TextAnalysis.bigramCrossEntropy(docs)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Reused") ||
        l.contains("Scan parquet") || l.contains("Join") || l.contains("Generate"))
      .mkString("\n"))
    spark.stop()
  }
}
