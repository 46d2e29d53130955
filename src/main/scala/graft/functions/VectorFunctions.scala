package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure built-in
  * higher-order functions (codegen'd, no UDF, no serialization off the
  * Tungsten row).
  *
  * All arithmetic is done in DOUBLE, accumulated sequentially in element
  * order — this matches DuckDB's `list_cosine_similarity(a::DOUBLE[],
  * b::DOUBLE[])` bit-for-bit, keeping the similarity operators
  * oracle-checkable with exact hash compares.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  /** Sequential-order dot product in double precision, as a native
    * codegen'd expression (see DotProduct — bit-identical to the
    * higher-order-function formulation, ~10x faster).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Shims
    Shims.column(DotProduct(Shims.expression(d(a)), Shims.expression(d(b))))
  }

  /** The interpreted higher-order-function formulation (kept as the
    * reference implementation the native one is spec-checked against).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. try_divide, not `/`: a zero vector has zero
    * norm and ANSI mode makes the division THROW; null similarity means
    * "undefined against this vector" and ranking/threshold consumers
    * drop it (DuckDB's list_cosine_similarity on clean data is
    * value-identical since the divisor is nonzero there).
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), l2norm(a) * l2norm(b))

  /** Squared L2 distance (sequential order). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
}
