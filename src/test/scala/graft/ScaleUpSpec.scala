package graft

import org.apache.spark.sql.functions._

/** The scale-rehearsal generator must preserve the invariants the
  * bench relies on: exact n× fact cardinality, intact FK chains,
  * fixed dims, and content decorrelation that keeps intra-replica
  * similarity structure while breaking cross-replica twins. */
class ScaleUpSpec extends SparkSpec {

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("scaleup").toString
    ScaleUp.scale(spark, sf, d, 2)
    d
  }
  private def t(name: String) = spark.read.parquet(s"$dst/$name.parquet")

  test("facts scale n×, dims stay fixed, keys stay unique") {
    def srcCount(n: String) = spark.read.parquet(s"$sf/$n.parquet").count()
    assert(t("lineitem").count() == 2 * srcCount("lineitem"))
    assert(t("events").count() == 2 * srcCount("events"))
    assert(t("region").count() == srcCount("region"))
    assert(t("nation").count() == srcCount("nation"))
    assert(t("orders").select("o_orderkey").distinct().count() ==
      t("orders").count())
    assert(t("events").select("event_id").distinct().count() ==
      t("events").count())
  }

  test("FK chains survive the shift on both sides") {
    val orphanedLines = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    val orphanedOrders = t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    val orphanedParts = t("lineitem").join(t("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count()
    assert(orphanedLines == 0 && orphanedOrders == 0 && orphanedParts == 0)
    // per-order line counts are replica-invariant (join shape holds)
    val perOrder = t("lineitem").groupBy("l_orderkey").count()
      .groupBy("count").count().collect().length
    val srcPerOrder = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_orderkey").count().groupBy("count").count()
      .collect().length
    assert(perOrder == srcPerOrder)
  }

  test("series cardinality scales; time range does not") {
    val src = Tables.events(spark, sf)
    val out = Tables.events(spark, dst)
    assert(out.select("user_id").distinct().count() ==
      2 * src.select("user_id").distinct().count())
    val Array(srcMin, srcMax) = src.agg(min("ts"), max("ts")).head()
      .toSeq.toArray
    val Array(outMin, outMax) = out.agg(min("ts"), max("ts")).head()
      .toSeq.toArray
    assert(srcMin == outMin && srcMax == outMax)
  }

  test("replica 0 content is verbatim; replica 1 is decorrelated") {
    val srcDocs = spark.read.parquet(s"$sf/documents.parquet")
    val sDoc = t("documents").agg(max("doc_id")).head().getLong(0) >
      srcDocs.agg(max("doc_id")).head().getLong(0)
    assert(sDoc)
    // replica 0 rows (doc_id < stride) carry the original text
    val changed = t("documents").alias("o")
      .join(srcDocs.alias("s"), col("o.doc_id") === col("s.doc_id"))
      .where(col("o.text") =!= col("s.text")).count()
    assert(changed == 0)
    // embeddings: rotation preserves norms exactly
    val normOff = t("embeddings")
      .select(col("vec_id"), aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x).as("n2"))
      .agg(min("n2"), max("n2")).head()
    val srcNorm = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x).as("n2"))
      .agg(min("n2"), max("n2")).head()
    assert(math.abs(normOff.getDouble(0) - srcNorm.getDouble(0)) < 1e-3 &&
      math.abs(normOff.getDouble(1) - srcNorm.getDouble(1)) < 1e-3)
  }
}
