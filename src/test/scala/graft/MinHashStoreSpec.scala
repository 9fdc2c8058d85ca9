package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
import graft.sources.MinHashStore

/** Parity + plan audits for the persisted MinHash-LSH index. */
class MinHashStoreSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private val split = 250L
  private lazy val table: String = {
    MinHashStore.build(docs.where(col("doc_id") < split), "graft_mh_spec",
      16, 8, 2)
    "graft_mh_spec"
  }

  test("probe equals the direct cross-boundary computation") {
    val batch = docs.where(col("doc_id") >= split)
    val got = MinHashStore.probe(spark, table, batch)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // direct path over the whole corpus, restricted to (history,
    // batch) pairs — bucket caps don't bind at spec scale, so the
    // cap-basis difference (history-only vs full bucket) is inert
    val sigs = Dedup.minhashSignature(docs, 16)
    val direct = Dedup.verifyCandidates(sigs,
      Dedup.minhashCandidates(sigs, 8, 2))
      .where(col("doc_a") < split && col("doc_b") >= split)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSeq
    assert(got == direct && got.nonEmpty, s"got=$got direct=$direct")
  }

  test("probe never reads history text; the batch side broadcasts") {
    val batch = docs.where(col("doc_id") >= split)
    val df = MinHashStore.probe(spark, table, batch)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the batch's text is consumed into its checkpointed signature
    // frame before the probe plan starts, so the probe itself scans
    // NO document text at all — only the stored postings + signature
    // sidecar — and the batch side rides broadcast joins
    assert(!plan.contains("FileScan parquet") ||
      !plan.linesIterator.exists(l =>
        l.contains("FileScan") && l.contains("documents")),
      s"probe scanned document text:\n${plan.take(2000)}")
    assert(plan.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains(table)),
      "probe did not read the stored index")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("append folds a batch into the index for the next probe") {
    MinHashStore.build(docs.where(col("doc_id") < split), "graft_mh_app",
      16, 8, 2)
    val mid = docs.where(col("doc_id") >= split && col("doc_id") < 400)
    MinHashStore.append(mid, "graft_mh_app")
    // the appended slice is now history: probing the tail finds
    // pairs anchored in BOTH the built and the appended ranges
    val tail = docs.where(col("doc_id") >= 400)
    val got = MinHashStore.probe(spark, "graft_mh_app", tail)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val sigs = Dedup.minhashSignature(docs, 16)
    val direct = Dedup.verifyCandidates(sigs,
      Dedup.minhashCandidates(sigs, 8, 2))
      .where(col("doc_a") < 400 && col("doc_b") >= 400)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSeq
    assert(got == direct, s"got=$got direct=$direct")
  }
}
