package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal generator: writes an n× blow-up of a testdata
  * directory with key-consistent surrogate shifts, so the bench can
  * rehearse a scale factor the driver never materialized (the
  * SF-dependent cliffs — percentile buffers, hot-bucket caps, AQE
  * switch points — are exactly what sf0.1 can't see).
  *
  * Replica r shifts every surrogate key by r·stride (stride = the
  * next power of ten above the key's max), applied consistently on
  * both sides of every FK (orders.o_custkey moves with
  * customer.c_custkey, lineitem moves with orders/part/supplier), so
  * join selectivity and per-key row counts are preserved while key
  * cardinality scales n×. Dimension tables (region, nation) stay
  * fixed, as a real warehouse's would. events scales its SERIES
  * cardinality (user_id shifts) — the realistic growth axis for a
  * TSDB — with the time range fixed, so per-bucket density rises n×.
  *
  * Content columns are decorrelated across replicas, not copied:
  * verbatim text/vector copies would plant every document in an
  * n×-hotter near-dup cluster and every vector at cosine 1.0 with
  * n−1 twins — an adversarial workload, not a larger one. Instead:
  *  - documents: ~10% of word positions (chosen by hash(pos, r))
  *    get a replica suffix. Within a replica both members of a
  *    planted near-dup pair are perturbed at the same positions, so
  *    intra-replica similarity structure survives; across replicas
  *    3-shingle Jaccard drops to ≈0.35, below dup thresholds.
  *  - embeddings: replica r rotates the vector by r coordinates — a
  *    permutation, so norms and all intra-replica pairwise cosines
  *    are exactly preserved while cross-replica cosines decorrelate;
  *    labels shift so cluster ids stay replica-local.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <dstDir> <n>`; point
  * SPARK_GRAFT_SF_DIR at dstDir to bench it.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <n>")
    val spark = Sessions.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .getOrCreate()
    Sessions.tune(spark)
    scale(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }

  /** Next power of ten strictly above m — the replica key stride. */
  private def stride(m: Long): Long = {
    var s = 1L
    while (s <= m) s *= 10
    s
  }

  def scale(spark: SparkSession, src: String, dst: String, n: Int): Unit = {
    require(n >= 1, s"n must be >= 1, got $n")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.drop("_r").repartition(parts)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    // one n-row replica dimension broadcast-crossed onto each scan:
    // one pass per table, no self-unions
    def rep(df: DataFrame) = df.crossJoin(broadcast(
      spark.range(n).withColumnRenamed("id", "_r")))
    def shift(c: String, s: Long): Column = col(c) + col("_r") * s

    // key strides from the source's actual ranges (one-row collects)
    def maxOf(t: String, c: String): Long =
      read(t).agg(max(col(c).cast("long"))).head().getLong(0)
    val sCust = stride(maxOf("customer", "c_custkey"))
    val sSupp = stride(maxOf("supplier", "s_suppkey"))
    val sPart = stride(maxOf("part", "p_partkey"))
    val sOrd  = stride(maxOf("orders", "o_orderkey"))
    val sEvt  = stride(maxOf("events", "event_id"))
    val sUser = stride(maxOf("events", "user_id"))
    val sDoc  = stride(maxOf("documents", "doc_id"))
    val sVec  = stride(maxOf("embeddings", "vec_id"))

    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)
    write(rep(read("customer"))
      .withColumn("c_custkey", shift("c_custkey", sCust)), "customer", 4)
    write(rep(read("supplier"))
      .withColumn("s_suppkey", shift("s_suppkey", sSupp)), "supplier", 2)
    write(rep(read("part"))
      .withColumn("p_partkey", shift("p_partkey", sPart)), "part", 4)
    write(rep(read("orders"))
      .withColumn("o_orderkey", shift("o_orderkey", sOrd))
      .withColumn("o_custkey", shift("o_custkey", sCust)), "orders", 16)
    write(rep(read("lineitem"))
      .withColumn("l_orderkey", shift("l_orderkey", sOrd))
      .withColumn("l_partkey", shift("l_partkey", sPart))
      .withColumn("l_suppkey", shift("l_suppkey", sSupp)), "lineitem", 32)
    // ts passes through in whatever physical shape the source dir
    // carries (LongType nanos under nanosAsLong, or TIMESTAMP_NTZ
    // for the MICROS form) — Tables.events normalizes on read either
    // way, so the scaled copy needs no conversion here
    write(rep(read("events"))
      .withColumn("event_id", shift("event_id", sEvt))
      .withColumn("user_id", shift("user_id", sUser)), "events", 32)
    write(rep(read("documents"))
      .withColumn("doc_id", shift("doc_id", sDoc))
      .withColumn("text",
        when(col("_r") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            (w, p) => when(pmod(hash(p, col("_r")), lit(10)) === 0,
              concat(w, lit("r"), col("_r"))).otherwise(w)), " ")))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", 8)
    // rotation is modular in the dimension so factors beyond dim
    // stay valid (n=100 > 64 dims broke the raw slice); replicas a
    // full dim apart re-align exactly (rotations form a cycle) —
    // acceptable for scale probes, labels still replica-local
    write(rep(read("embeddings"))
      .withColumn("vec_id", shift("vec_id", sVec))
      .withColumn("_rot", pmod(col("_r"), size(col("embedding"))))
      .withColumn("embedding",
        when(col("_rot") === 0, col("embedding")).otherwise(concat(
          slice(col("embedding"), col("_rot") + 1,
            size(col("embedding")) - col("_rot")),
          slice(col("embedding"), lit(1), col("_rot")))))
      .drop("_rot")
      .withColumn("label",
        (col("label") + col("_r") * 1000).cast("int")), "embeddings", 4)
  }
}
