package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Dot products stay inside whole-stage codegen via the higher-order
  * functions `zip_with` + `aggregate` — no UDF, no RDD.
  *
  * Scale posture: brute-force top-k is the small-N oracle / recall
  * baseline; the production path is LSH bucketing (random-hyperplane
  * signs) where candidate joins happen within buckets only. On a
  * cluster the bucketed layout would be written bucketed-by(bucket)
  * so repeated ANN queries co-locate without a shuffle.
  */
object Similarity {

  /** Σ a_i·b_i over two float-array columns (codegen HOF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbors for a query set: cross-join
    * queries × corpus (queries side is tiny → broadcast), rank per
    * query. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("q_emb"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").cast("array<double>").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos_v"), col("rk").cast("long").as("rk"))
  }

  /** Random-hyperplane LSH bucket id: `planes` pseudo-random ±1
    * hyperplanes derived from a fixed (table-)seed via integer
    * mixing of (plane, dim) — deterministic, no stored model. Sign
    * pattern of the projections = bucket key. */
  def lshBucket(emb: Column, dim: Int, planes: Int, seed: Long = 0L): Column = {
    val signs = (0 until planes).map { p =>
      val proj = (0 until dim).map { i =>
        val w = if (((p * 1315423911L + i * 2654435761L + seed * 97531L) >>> 7) % 2 == 0)
          1.0 else -1.0
        element_at(emb, i + 1) * lit(w)
      }.reduce(_ + _)
      when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1 << p)
    }
    signs.reduce(_ + _)
  }

  /** Multi-table LSH ANN: `tables` independent bucketings (fewer
    * planes each → wider buckets); candidates = docs sharing any
    * table's bucket with the query; exact cosine re-rank on the
    * candidate set only. Recall rises with tables, cost with
    * 1/2^planes — the classic tradeoff; recall vs. cosineTopK is
    * asserted in the spec.
    *
    * Scale: candidate generation is `tables` equi-joins on (table,
    * bucket) — never all-pairs; at 100 TB the corpus side would be
    * written bucketed-by(bucket) so each table's probe is a
    * shuffle-free bucket join. */
  def lshAnn(corpus: DataFrame, queries: DataFrame, k: Int,
             dim: Int = 64, planes: Int = 4, tables: Int = 6): DataFrame = {
    val qb = (0 until tables).map { t =>
      queries.select(col("vec_id").as("q_id"), lit(t).as("tbl"),
        lshBucket(col("embedding"), dim, planes, t).as("bucket"))
    }.reduce(_ unionByName _)
    val cb = (0 until tables).map { t =>
      corpus.select(col("vec_id").as("c_id"), lit(t).as("tbl"),
        lshBucket(col("embedding"), dim, planes, t).as("bucket"))
    }.reduce(_ unionByName _)
    val cands = cb.join(qb, Seq("tbl", "bucket"))
      .where(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id").distinct()
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").cast("array<double>").as("q_emb"))
    val c = corpus.select(col("vec_id").as("c_id"),
      col("embedding").cast("array<double>").as("c_emb"))
    val scored = cands.join(broadcast(q), "q_id").join(c, "c_id")
      .select(col("q_id"), col("c_id"),
        cosine(col("q_emb"), col("c_emb")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("q_id"), col("c_id"), round(col("cos"), 6).as("cos_v"), col("rk").cast("long").as("rk"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold.
    * Brute-force form (oracle); the LSH-blocked form reuses
    * lshBucket for the 100 TB path. */
  def cosineNearDup(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").cast("array<double>").as("emb_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").cast("array<double>").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("emb_a"), col("emb_b")).as("cos"))
      .where(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_v"))
  }
}
