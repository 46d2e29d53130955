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

  // ── IVF (inverted-file) ANN ──────────────────────────────────────────
  /** IVF-flat: partition the corpus into K cells around fixed centroids
    * (deterministic pick: the first K vectors — a production build would
    * run k-means; the *index structure* is what matters here), then
    * search only the `nprobe` cells nearest to each query, exact cosine
    * re-rank inside them. Sub-quadratic: each query touches ~nprobe/K of
    * the corpus; the corpus-side assignment is one scan.
    */
  def ivfTopK(s: SparkSession, dir: String,
      k: Int = 5, nQueries: Int = 5, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .transform(Tables.spread(_, col("vec_id")))
    // centroids to the driver: K × dim doubles — tiny, one-time
    val centroids: Array[Array[Double]] = e.filter(col("vec_id") < nCells)
      .orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // squared-L2 distance to each centroid, as literal-array dots
    def distArr(emb: org.apache.spark.sql.Column) = array(centroids.map { c =>
      val lits = typedLit(c.toSeq)
      // |x-c|^2 = |x|^2 - 2<x,c> + |c|^2 ; monotone equivalent for
      // fixed x across cells: -2<x,c> + |c|^2
      lit(-2.0) * dot(emb, lits) + lit(c.map(v => v * v).sum)
    }: _*)
    val withCell = e
      .withColumn("dists", distArr(col("embedding")))
      .withColumn("cell",
        expr("array_position(dists, array_min(dists))").cast("int"))
    val corpus = withCell.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("cell"))
    // queries probe the nProbe nearest cells: sort (dist, idx) structs
    val q = withCell.filter(col("vec_id") < nQueries)
      .withColumn("ranked", expr(
        s"transform(slice(array_sort(transform(sequence(1, ${centroids.length}), " +
          s"i -> struct(dists[i-1] AS d, i AS idx))), 1, $nProbe), x -> x.idx)"))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(col("ranked")).as("cell"))
      .withColumn("cell", col("cell").cast("int"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

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
