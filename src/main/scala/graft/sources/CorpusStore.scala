package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sink side of the curation pipeline — the corpus counterpart of
  * [[SeriesStore]]: materialize the KEPT documents in the layout a
  * training loader streams, so "curate" ends in files, not a frame.
  *
  *  - *Partitioned by split* (`split=train/validation/test` dirs):
  *    loaders and evals mount only their split — partition pruning,
  *    and no risk of a test doc slipping into a train glob.
  *  - *Shard-disjoint files, position-sorted*: rows hash-route by
  *    the shuffle shard (within a split, a shard never straddles two
  *    files) and each file is (shard, position)-sorted, so a loader
  *    reading its split's files in shard order replays the exact
  *    deterministic permutation of
  *    [[graft.pipeline.Corpus.shuffleOrder]] with sequential reads.
  *  - At real scale set `maxRecordsPerFile`; files within a shard
  *    stay ordered segments (lexicographic part-file order).
  *
  * No global sort anywhere: one hash exchange on shard + local
  * sorts, the same two-level discipline as shuffleOrder itself. */
object CorpusStore {

  /** Write kept docs (manifest.keep == 1) under `path`, partitioned
    * by split, sharded/ordered by the training shuffle. Returns the
    * kept-row count (one action — the write). */
  def write(docs: DataFrame, manifest: DataFrame, order: DataFrame,
            path: String, nShards: Int = 8): Long = {
    val kept = docs
      .join(manifest.where(col("keep") === 1)
        .select("doc_id", "split"), "doc_id")
      .join(order.select("doc_id", "shard", "position"), "doc_id")
    kept
      .repartition(nShards, col("shard"))
      // split leads the sort so the dynamic-partition writer's
      // required ordering ([split]) is already satisfied and it adds
      // NO sort of its own — otherwise it re-sorts by split alone
      // (unstably) and destroys the (shard, position) order
      .sortWithinPartitions("split", "shard", "position")
      .write.mode("overwrite")
      .partitionBy("split")
      .parquet(path)
    kept.sparkSession.read.parquet(path).count()
  }

  def read(spark: SparkSession, path: String,
           split: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(path)
    split.map(s => df.where(col("split") === s)).getOrElse(df)
  }
}
