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

  test("t11 redacts every injected email/IP/phone and nothing survives") {
    val rows = TextAnalysis.piiRedact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, redacted) = (r.getLong(0), r.getString(4))
      assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 1,
        s"doc $id: expected exactly one match per class, got " +
          s"(${r.getInt(1)}, ${r.getInt(2)}, ${r.getInt(3)})")
      assert(redacted.contains("<EMAIL>") && redacted.contains("<IP>") &&
        redacted.contains("<PHONE>"), s"doc $id: placeholder missing")
      assert(!redacted.contains("@") && !redacted.contains("10.0.") &&
        !redacted.contains("+1 "), s"doc $id: raw PII survived: $redacted")
    }
  }

  test("t12 packing matches an independent sequential re-pack") {
    val capacity = 256
    val got = TextAnalysis.sequencePack(spark, sfDir, capacity, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    assert(got.nonEmpty)
    // independent reference: per shard, walk docs in id order with a
    // plain running counter (the semantics a sequence-builder consumer
    // assumes), and compare every assignment
    got.groupBy(_._2).foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, nTok, bin, off) =>
        assert(bin == (cum / capacity).toInt,
          s"doc $id shard $shard: bin $bin != ${cum / capacity}")
        assert(off == (cum % capacity).toInt,
          s"doc $id shard $shard: offset $off != ${cum % capacity}")
        cum += nTok
      }
    }
    // every doc packed exactly once
    assert(got.map(_._1).distinct.length == got.length)
  }
}
