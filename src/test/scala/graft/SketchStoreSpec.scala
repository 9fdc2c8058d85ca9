package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sketches
import graft.sources.SketchStore

class SketchStoreSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    (0 until 40).map { i =>
      (i.toLong, s"src${i % 2}",
        (0 until 8).map(j => s"tok_${i}_$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
  }

  test("stored estimate is byte-equal to the direct sketch") {
    val docs = corpus
    val t = "graft_hll_spec"
    // two appended halves: the read-time max-merge is on the path
    SketchStore.build(docs.where(col("doc_id") < 20), t)
    SketchStore.append(docs.where(col("doc_id") >= 20), t)
    val stored = SketchStore.estimate(spark, t, docs)
      .collect().map(_.toSeq)
    val direct = Sketches.hllDistinct(docs).collect().map(_.toSeq)
    assert(stored.toSeq == direct.toSeq)
  }

  test("compaction folds appended rows, answers unchanged") {
    val docs = corpus
    val t = "graft_hll_spec_c"
    SketchStore.build(docs.where(col("doc_id") < 20), t)
    SketchStore.append(docs.where(col("doc_id") >= 20), t)
    val before = SketchStore.estimate(spark, t, docs)
      .collect().map(_.toSeq)
    val rawRows = spark.table(t).count()
    SketchStore.compact(spark, t)
    val compactRows = spark.table(t).count()
    assert(compactRows <= rawRows)
    // compacted rows are exactly the merged register set
    assert(compactRows ==
      SketchStore.registers(spark, t).count())
    val after = SketchStore.estimate(spark, t, docs)
      .collect().map(_.toSeq)
    assert(after.toSeq == before.toSeq)
  }

  test("per-source reads prune source partitions") {
    val docs = corpus
    val t = "graft_hll_spec_p"
    SketchStore.build(docs, t)
    val plan = spark.table(t).where(col("source") === "src0")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src0"),
      "source filter did not reach the partition pruning:\n" +
        plan.take(2000))
  }
}
