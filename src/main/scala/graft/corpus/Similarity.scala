package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search (SURVEY.md §7 phase F): brute-force cosine
 * top-k as the exact baseline, and an inverted-file (IVF) variant that
 * probes only the query's coarse partition — the shape that survives
 * 100 TB (per-bucket work instead of a full cross join).
 *
 * Float discipline for the DuckDB oracle: every element is cast
 * float→double BEFORE any arithmetic, and all sums are sequential left
 * folds in list order (`aggregate` here, `list_reduce` there), so the
 * IEEE results are bit-identical across engines.
 */
object Similarity {

  /** Sequential left-fold dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), _ + _)

  /** L2 norm via the same fold. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), _ + _))

  /** Cosine similarity rounded to 6 dp (rounding decouples the compare
    * from last-ulp division noise). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Hot-path dot/norm as native codegen'd Catalyst expressions
    * ([[VectorExpr]]): identical IEEE result to the HOF fold (sequential
    * left-to-right double accumulation over the same element order — see
    * SimilaritySpec's cross-check), but the pair scan stays inside
    * whole-stage codegen with primitive float access, no per-call
    * Tungsten→Seq conversion. */
  private def dotUdf(a: Column, b: Column): Column = VectorExpr.dotF(a, b)
  private def normUdf(a: Column): Column = VectorExpr.normF(a)

  /** cosine from a precomputed-norm pair: round(dot/(n1*n2), 6). */
  private def cosineFast(e1: Column, n1: Column, e2: Column, n2: Column): Column =
    round(dotUdf(e1, e2) / (n1 * n2), 6)

  /** All pairs (v1 < v2) with cosine ≥ threshold. Quadratic by intent —
    * the exact-verification baseline. At scale, use [[ivfTopK]] or the
    * LSH candidates instead. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val withNorm = Dedup.fanout(emb)
      .select(col(idCol), col(vecCol), normUdf(col(vecCol)).as("nrm"))
    withNorm.select(col(idCol).as("v1"), col(vecCol).as("e1"), col("nrm").as("nrm1"))
      .join(withNorm.select(col(idCol).as("v2"), col(vecCol).as("e2"), col("nrm").as("nrm2")),
        col("v1") < col("v2"))
      .withColumn("cos_sim", cosineFast(col("e1"), col("nrm1"), col("e2"), col("nrm2")))
      .filter(col("cos_sim") >= threshold)
      .select("v1", "v2", "cos_sim")
  }

  /** Exact brute-force top-k neighbors for a query subset. The query side
    * is broadcast (it is small by construction), so the big side streams
    * once with no shuffle before the per-query top-k. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int): DataFrame = {
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        normUdf(col(vecCol)).as("qnrm"))
    val ranked = Dedup.fanout(emb)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
        normUdf(col(vecCol)).as("nnrm"))
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        cosineFast(col("qvec"), col("qnrm"), col("nvec"), col("nnrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    ranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }

  /** IVF-style top-k: probe only vectors in the query's coarse bucket
    * (`bucketCol` — a cluster id; the fixture's `label` stands in for a
    * k-means assignment). Same output shape as brute force; recall trades
    * against the 1/|buckets| work reduction, exactly like FAISS IVF with
    * nprobe=1. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, bucketCol: String,
              queryPred: Column, k: Int): DataFrame = {
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        col(bucketCol).as("qbucket"), normUdf(col(vecCol)).as("qnrm"))
    val ranked = Dedup.fanout(emb)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
        col(bucketCol).as("nbucket"), normUdf(col(vecCol)).as("nnrm"))
      .join(broadcast(queries),
        col("qbucket") === col("nbucket") && col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        cosineFast(col("qvec"), col("qnrm"), col("nvec"), col("nnrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    ranked.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
  }
}
