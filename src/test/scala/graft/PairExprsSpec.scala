package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 codegen'd AscPairs kernel value-identical to the
  * nested-HOF pair comprehension it replaced in Graph.copurchaseEdges —
  * the original formulation lives HERE as the executable reference
  * (the ByteplaneExprsSpec pattern).
  */
class PairExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ascPairsCol(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.Shims.column(
      graft.functions.AscPairs(
        org.apache.spark.sql.graft.Shims.expression(c)))

  test("AscPairs == nested transform/sequence/struct HOF tree") {
    // set sizes 2..8 (TPC-H lines-per-order ≤ 7, +1 beyond), sorted
    // ascending as copurchaseEdges' sort_array(collect_set) produces,
    // plus negative and boundary values
    val rows = Seq(
      Seq(1L, 2L),
      Seq(-5L, 0L, 7L),
      Seq(1L, 2L, 3L, 4L),
      Seq(10L, 20L, 30L, 40L, 50L),
      Seq(-9L, -3L, 0L, 1L, 2L, 3L),
      Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue),
      (1L to 8L).toSeq)
    val df = rows.toDF("ps")
    val ref = df.select(explode(flatten(transform(
        sequence(lit(0), size(col("ps")) - 2),
        i => transform(
          sequence(i + 1, size(col("ps")) - 1),
          j => struct(element_at(col("ps"), i + 1).as("pa"),
            element_at(col("ps"), j + 1).as("pb")))))).as("e"))
      .select(col("e.pa"), col("e.pb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fast = df.select(explode(ascPairsCol(col("ps"))).as("e"))
      .select(col("e.pa"), col("e.pb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // identical pair SEQUENCE (values and order), not just the set
    assert(fast == ref)
    assert(fast.size == rows.map(s => s.size * (s.size - 1) / 2).sum)
  }
}
