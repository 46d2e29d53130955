package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  /** Full-precision epoch micros: getTime is millis (losing the
    * sub-millisecond digits Spark's timestamp comparisons see), so
    * rebuild from seconds + nanos-of-second.
    */
  private def us(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  /** (user_id, event_type, ts_us) with nulls dropped, driver-side. */
  private def rawEvents(): Seq[(Long, String, Long)] =
    Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), us(r.getTimestamp(2)))).toSeq

  test("q63 retention equals a driver-side cohort recompute") {
    val got = Behavior.retention(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap

    // driver recompute: truncate to Monday-start week in UTC
    def weekStart(tsUs: Long): Long = {
      val day = 86400000L
      val d = Math.floorDiv(tsUs / 1000L, day) // days since epoch (UTC)
      // 1970-01-01 was a Thursday; Monday-of-week for day d:
      val dow = Math.floorMod(d + 3, 7) // 0 = Monday
      (d - dow) * day
    }
    val uw = rawEvents().map { case (u, _, ts) => (u, weekStart(ts)) }.distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val want = uw.groupBy { case (u, w) =>
      (new Timestamp(cohort(u)), ((w - cohort(u)) / (7 * 86400000L)).toInt)
    }.map { case (k, rows) => k -> rows.size.toLong }

    assert(got === want)
    // every cohort has an offset-0 cell containing its full membership
    val cohortSizes = cohort.groupBy(_._2).map { case (w, us) =>
      new Timestamp(w) -> us.size.toLong }
    cohortSizes.foreach { case (w, n) =>
      assert(got((w, 0)) === n, s"cohort $w offset 0")
    }
    // retention is monotonically <= cohort size at every offset
    got.foreach { case ((w, off), n) =>
      assert(n <= cohortSizes(w), s"cell ($w, $off) exceeds cohort")
    }
    assert(got.nonEmpty)
  }

  test("q64 funnel equals a driver-side conditional-min chain and shrinks monotonically") {
    val rows = Behavior.funnel(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq ===
      Seq((1, "view"), (2, "click"), (3, "purchase")))
    val Seq(nV, nC, nP) = rows.map(_._3).toSeq

    val byUser = rawEvents().groupBy(_._1)
    val vTs = byUser.flatMap { case (u, es) =>
      val vs = es.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None else Some(u -> vs.min)
    }
    val cTs = vTs.flatMap { case (u, v) =>
      val cs = byUser(u).filter(e => e._2 == "click" && e._3 >= v)
        .map(_._3)
      if (cs.isEmpty) None else Some(u -> cs.min)
    }
    val pTs = cTs.flatMap { case (u, c) =>
      val ps = byUser(u).filter(e => e._2 == "purchase" && e._3 >= c)
        .map(_._3)
      if (ps.isEmpty) None else Some(u -> ps.min)
    }
    assert(nV === vTs.size.toLong)
    assert(nC === cTs.size.toLong)
    assert(nP === pTs.size.toLong)
    assert(nV >= nC && nC >= nP, "funnel must narrow")
    assert(nP > 0, "no user completes the funnel on this corpus")
  }

  test("q65 conversion lag equals a driver-side recompute over the chain") {
    val row = Behavior.conversionLag(spark, sfDir).collect().head
    val (n, mean, mn, mx) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))

    val byUser = rawEvents().groupBy(_._1)
    val lags = byUser.flatMap { case (u, es) =>
      def first(tpe: String, atOrAfter: Long): Option[Long] = {
        val c = es.filter(e => e._2 == tpe && e._3 >= atOrAfter).map(_._3)
        if (c.isEmpty) None else Some(c.min)
      }
      for {
        v <- first("view", Long.MinValue)
        c <- first("click", v)
        p <- first("purchase", c)
      } yield p - v
    }.toSeq
    assert(n === lags.size.toLong)
    assert(mn === lags.min.toDouble / 1e6)
    assert(mx === lags.max.toDouble / 1e6)
    assert(math.abs(mean - lags.sum.toDouble / n / 1e6) < 1e-9)
    assert(mn >= 0.0 && mn <= mx)
  }

  test("q66 stickiness equals a driver-side trailing-WAU recompute") {
    val got = Behavior.stickiness(spark, sfDir).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    try {
      val ud = rawEvents().map { case (u, _, tsUs) =>
        (u, Math.floorDiv(tsUs / 1000000L, 86400L)) // epoch day, UTC
      }.distinct
      val dau = ud.groupBy(_._2).map { case (d, rows) => d -> rows.size }
      val wau = ud.flatMap { case (u, d) => (0 to 6).map(i => (u, d + i)) }
        .distinct.groupBy(_._2).map { case (d, rows) => d -> rows.size }
      val want = dau.map { case (d, n) =>
        java.time.LocalDate.ofEpochDay(d).toString ->
          ((n.toLong, wau(d).toLong, n.toDouble / wau(d).toDouble))
      }
      assert(got === want)
      assert(got.nonEmpty)
      // stickiness is a fraction of the trailing week: (0, 1]
      got.values.foreach { case (da, wa, st) =>
        assert(da <= wa && st > 0.0 && st <= 1.0)
      }
    } finally spark.catalog.clearCache()
  }
}
