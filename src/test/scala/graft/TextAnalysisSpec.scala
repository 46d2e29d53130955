package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The approx-percentile quality gate (the 100 TB path: map-side
  * combinable sketch instead of shuffling every (lang, score) pair)
  * must agree with the exact gate. With sketch accuracy far above the
  * corpus size the rank error is < 1, so the only divergence allowed is
  * the boundary doc per language whose score IS the returned central
  * value (approx_percentile returns an actual value; exact percentile
  * interpolates the midpoint).
  */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("approx quality gate keeps the exact gate's set up to boundary docs") {
    val exact = TextAnalysis.qualityFilter(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = TextAnalysis.qualityFilter(spark, sfDir, approx = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nLangs = 5
    val symDiff = (exact diff approx) ++ (approx diff exact)
    assert(exact.nonEmpty)
    assert(symDiff.size <= nLangs,
      s"approx gate diverged on ${symDiff.size} docs: $symDiff")
  }
}
