package graft

import org.apache.spark.sql.functions._
import graft.sources.SeriesStore
import graft.tsdb.Vectors

/** Plan audits for the partitioned + bucketed storage layout. */
class StoreSpec extends SparkSpec {

  private lazy val table: String = {
    val samples = Vectors.samples(Tables.events(spark, sf))
    SeriesStore.write(samples, "graft_series_store", buckets = 4)
    "graft_series_store"
  }

  test("round-trips the sample frame") {
    val n = Vectors.samples(Tables.events(spark, sf)).count()
    assert(SeriesStore.read(spark, table).count() == n)
  }

  test("dt bounds prune partitions at planning time") {
    val df = SeriesStore.read(spark, table,
      fromDt = Some("2024-01-01"), untilDt = Some("2024-01-08"))
    val plan = df.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("dt"), s"expected dt partition filters, plan: $pf")
    // pruned scan reads only the bounded week of files
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("2024-01-20"), "unpruned partition in scan")
  }

  test("per-series aggregation on the bucketed table runs shuffle-free") {
    val agged = SeriesStore.read(spark, table)
      .groupBy("name", "user_id")
      .agg(sum("value").as("sum_v"))
    agged.collect()
    val plan = agged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed distribution should satisfy the aggregation:\n" + plan.take(2000))
  }

  test("self-join on the series key runs shuffle-free") {
    val l = SeriesStore.read(spark, table).groupBy("name", "user_id")
      .agg(max("value").as("mx"))
    val r = SeriesStore.read(spark, table).groupBy("name", "user_id")
      .agg(min("value").as("mn"))
    val joined = l.join(r, Seq("name", "user_id"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "bucketed join should not shuffle:\n" + plan.take(2000))
  }
}
