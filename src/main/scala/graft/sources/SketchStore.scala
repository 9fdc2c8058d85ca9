package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Sketches

/** Persisted HLL register table — the audit pipeline's at-rest
  * sketch state (daily distinct-vocabulary tracking without ever
  * re-reading history): registers write source-partitioned, appends
  * are BLIND row appends (registers are max-mergeable, so duplicate
  * (source, idx) rows are folded by `max` at read time — an append
  * never reads the table), and [[compact]] folds the rows back to
  * ≤m per source in place. [[estimate]] runs the SAME estimator
  * code path as the direct `corpus_hll` ([[Sketches.hllEstimateFrom]]
  * is shared), so stored and direct answers are byte-identical —
  * spec-pinned, and the `store_hll` gate entry reuses the
  * `corpus_hll` oracle SQL verbatim.
  *
  * Scale: the table holds ≤ sources × 256 rows per append batch —
  * the whole point of persisting the sketch instead of the corpus;
  * a per-source probe prunes `source=` partitions (plan-audited in
  * the spec). Follows the build/append/probe/compact shape of
  * [[SeriesStore]]/[[VectorStore]]/[[MinHashStore]].
  */
object SketchStore {

  private def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Build the register table from a corpus. */
  def build(docs: DataFrame, table: String): Unit = {
    val spark = docs.sparkSession
    dropTable(spark, table)
    Sketches.hllRegisters(docs)
      .write.mode("overwrite").partitionBy("source")
      .format("parquet").saveAsTable(table)
  }

  /** Fold a new batch in: a blind row append — max-merge happens at
    * read, so appending never reads history. */
  def append(docs: DataFrame, table: String): Unit =
    Sketches.hllRegisters(docs)
      .write.mode("append").partitionBy("source")
      .format("parquet").saveAsTable(table)

  /** The merged register view (max over appended rows). */
  def registers(spark: SparkSession, table: String): DataFrame =
    spark.table(table).groupBy("source", "idx").agg(max("mj").as("mj"))

  /** Estimate from the STORED registers — byte-identical to the
    * direct [[Sketches.hllDistinct]] when the table holds the same
    * corpus (shared estimator), with the exact calibration column
    * still computed from the live corpus frame. */
  def estimate(spark: SparkSession, table: String,
               docs: DataFrame): DataFrame =
    Sketches.hllEstimateFrom(registers(spark, table),
      Sketches.hllExact(docs))

  /** In-place compaction: fold appended duplicate registers back to
    * ≤m rows per source. */
  def compact(spark: SparkSession, table: String): Unit = {
    val folded = registers(spark, table).localCheckpoint(eager = true)
    folded.write.mode("overwrite").partitionBy("source")
      .format("parquet").saveAsTable(table)
  }
}
