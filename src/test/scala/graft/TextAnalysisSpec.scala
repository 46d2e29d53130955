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

  test("approx quality gate diverges only inside the two-medians interval") {
    def rows(approx: Boolean) =
      TextAnalysis.qualityFilter(spark, sfDir, approx = approx)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getDouble(3)))
        .toMap
    val exact = rows(approx = false)
    val approx = rows(approx = true)
    assert(exact.nonEmpty)
    val medExact = exact.values.map { case (l, _, m) => l -> m }.toMap
    val medApprox = approx.values.map { case (l, _, m) => l -> m }.toMap
    // a doc may flip ONLY if its score sits between the interpolated
    // exact median and the nearest-rank approx median of its language
    // (score ties at the returned value all flip together — the bound
    // is the interval, not a count)
    val symDiff = (exact.keySet diff approx.keySet) ++ (approx.keySet diff exact.keySet)
    symDiff.foreach { id =>
      val (lang, score, _) = exact.getOrElse(id, approx(id))
      val (lo, hi) = (math.min(medExact(lang), medApprox(lang)),
        math.max(medExact(lang), medApprox(lang)))
      assert(score >= lo && score <= hi,
        s"doc $id (lang $lang, score $score) flipped outside medians [$lo, $hi]")
    }
  }
}
