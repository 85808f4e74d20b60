package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2.4,
  * 64-dim float vectors).
  *
  * Scale design (§5): brute force is the correctness baseline — the
  * tiny query set broadcasts and streams past the big side with no
  * shuffle of the embeddings at all. The LSH path buckets the big side
  * by random-hyperplane signatures so each query only scores candidates
  * sharing a bucket in one of L tables (equi-join on (table, bucket),
  * shuffle bounded by bucket sizes, never all-pairs).
  *
  * Determinism (§4): dot products accumulate per-element products as
  * DECIMAL(30,12) — exact, order-independent — so the cosine is a fixed
  * chain of double ops on identical inputs in Spark and DuckDB.
  */
object Similarity {

  /** Exact, order-independent dot product of two float vectors:
    * per-element double product → scale-12 decimal → exact sum →
    * double, via the codegen'd [[graft.functions.DotDecimal]]
    * expression (bit-identical to the declarative
    * aggregate-over-zip_with form it replaces, ~6× faster because
    * higher-order functions evaluate interpreted).
    */
  private def dotDec(a: Column, b: Column): Column =
    graft.functions.DotDecimal.dot_decimal(a, b)

  private def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("nrm", sqrt(dotDec(col("embedding"), col("embedding"))))

  /** `sim_cosine_topk`: brute-force cosine top-k for the query set
    * (vec_id < 8) against every other vector. The query side is
    * broadcast, so the plan is a BroadcastNestedLoopJoin streaming the
    * big side once — the right brute-force shape at any scale where the
    * query set is small.
    */
  def cosineTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val base = withNorm(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")))
      .persist() // norm is an interpreted HOF; both join sides reuse it
    val q = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val scored = broadcast(q)
      .join(base, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dotDec(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-row array of L bucket ids: bucket bit j of table t is the sign
    * of the projection onto a deterministic ±1 hyperplane (integer-hash
    * parity, no RNG). One codegen'd pass via
    * [[graft.functions.LshBuckets]] — the declarative
    * transform/aggregate/zip_with nest it replaces evaluated
    * interpreted (bit-equality asserted in ExprSpec).
    */
  private def bucketCol(tables: Int, bits: Int): Column =
    graft.functions.LshBuckets.lsh_buckets(col("embedding"), tables, bits)

  /** `sim_ann_lsh`: approximate top-k via L random-hyperplane hash
    * tables. Candidates = vectors sharing a (table, bucket) with the
    * query in any table; exact cosine re-ranks candidates only. Emits
    * one row per (query, rank) plus a null-candidate row for queries
    * whose buckets were empty, so the output always covers the query set.
    */
  def annLsh(spark: SparkSession, dir: String, k: Int = 10,
             tables: Int = 16, bits: Int = 4): DataFrame = {
    val base = withNorm(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")))
      .persist()
    val bucketed = base.select(col("vec_id"), col("embedding"), col("nrm"),
      posexplode(bucketCol(tables, bits)).as(Seq("table_id", "bucket")))
      .persist() // bucket signatures cost tables*bits*dims interpreted ops per row
    val q = bucketed.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("nrm").as("qn"),
        col("table_id"), col("bucket"))
    val cand = q.join(bucketed, Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("qn"), col("vec_id"), col("embedding"), col("nrm"))
      .dropDuplicates("query_id", "vec_id")
    val ranked = cand
      .select(col("query_id"), col("vec_id"),
        (dotDec(col("qe"), col("embedding")) / (col("qn") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
    base.filter(col("vec_id") < 8).select(col("vec_id").as("query_id"))
      .join(ranked, Seq("query_id"), "left")
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
