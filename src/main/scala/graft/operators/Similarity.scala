package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (north-star extension:
  * ANN over an Array[Float] column).
  *
  * Two paths:
  *   - bruteForceTopK — EXACT top-k per query: broadcast the (small)
  *     query set against the corpus scan, rank with a window whose
  *     rank-filter Spark 3.5+/4 rewrites to WindowGroupLimitExec —
  *     per-partition partial top-k then a tiny final merge, i.e. the
  *     scalable two-phase top-k for free, no full sort of the corpus.
  *   - lshTopK — sub-quadratic scale path: random-hyperplane signatures
  *     (fixed seed → deterministic), bucket join with Hamming<=1
  *     multiprobe, exact cosine re-rank inside candidate buckets.
  *     Approximate by design → no SQL oracle; its recall against
  *     bruteForceTopK is asserted in SimilaritySpec.
  *
  * Cosine arithmetic is sequential-double (VectorFunctions), matching
  * DuckDB's list_cosine_similarity on DOUBLE[] bit-for-bit.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector (vec_id < nQueries), the
    * k nearest corpus vectors (self excluded).
    * Output: (query_id, rank, neighbor_id, cos).
    */
  def bruteForceTopK(s: SparkSession, dir: String,
      k: Int = 5, nQueries: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .transform(Tables.spread(_, col("vec_id")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ── Random-hyperplane LSH ────────────────────────────────────────────
  /** Fixed-seed Gaussian hyperplanes: nBits × dim. Deterministic. */
  private[operators] def hyperplanes(nBits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature of a vector under the fixed hyperplanes,
    * packed into an int column.
    */
  private def signature(emb: org.apache.spark.sql.Column,
      planes: Array[Array[Double]]): org.apache.spark.sql.Column =
    planes.zipWithIndex.map { case (h, i) =>
      val proj = aggregate(
        zip_with(emb.cast("array<double>"),
          array(h.map(lit): _*), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-k via LSH buckets + multiprobe (flip each single
    * bit of the query signature) + exact cosine re-rank of candidates.
    */
  def lshTopK(s: SparkSession, dir: String,
      k: Int = 5, nQueries: Int = 5, nBits: Int = 6, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val e = Tables.embeddings(s, dir)
      .transform(Tables.spread(_, col("vec_id")))
      .select(col("vec_id"), col("embedding"),
        signature(col("embedding"), planes).as("sig"))
    // corpus rows keyed by their single bucket
    val corpus = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("sig").as("bucket"))
    // queries probe their own bucket plus all Hamming-1 buckets
    val probes = (0 until nBits).map(i => col("sig").bitwiseXOR(lit(1 << i))) :+ col("sig")
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(array(probes: _*)).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }
}
