package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** t33 (duplicate word-3-gram fraction): an independent plain-Scala
  * recompute — the operator's HOF pipeline must agree with a naive
  * implementation — plus range invariants.
  */
class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("t33 equals a plain-Scala naive recompute on every doc") {
    val got = TextAnalysis.dupNgramFraction(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val want = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val ws = r.getString(1).toLowerCase.trim.split("\\s+")
        if (ws.length < 3) None
        else {
          val gs = ws.sliding(3).map(_.mkString(" ")).toSeq
          Some(r.getLong(0) ->
            (gs.size.toLong, (gs.size - gs.distinct.size).toLong,
              (gs.size - gs.distinct.size).toDouble / gs.size))
        }
      }.toMap
    assert(got.keySet === want.keySet && got.nonEmpty)
    got.foreach { case (k, v) => assert(v === want(k), s"doc $k") }
    // invariants
    got.values.foreach { case (n, d, f) =>
      assert(n >= 1 && d >= 0 && d <= n && f >= 0.0 && f <= 1.0)
    }
  }
}
