package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("interval-blocked range join equals the naive theta join") {
    val blocked = TemporalJoins.rangeJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("double").as("sec"))
    val a = e.select(col("user_id"), col("sec").as("sec_a"))
    val b = e.select(col("user_id").as("uid_b"), col("sec").as("sec_b"))
    val naive = a.join(b, col("user_id") === col("uid_b") &&
        col("sec_b") > col("sec_a") && col("sec_b") - col("sec_a") <= 60)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(blocked === naive)
    assert(blocked.values.sum > 0)
  }

  test("as-of join: every matched click precedes its purchase") {
    val m = TemporalJoins.asOfJoin(spark, sfDir)
    assert(m.count() > 0)
    val bad = m.filter(col("last_click_ts").isNotNull &&
      col("last_click_ts") > col("purchase_ts")).count()
    assert(bad === 0)
    // at least one purchase has a prior click in this data
    assert(m.filter(col("last_click_ts").isNotNull).count() > 0)
  }

  test("q60 gap fill: dense hourly grid per user, LOCF values, filled flags honest") {
    val g = TemporalJoins.gapFill(spark, sfDir).cache()
    try {
      // grid density: per user, row count == hours between min and max + 1
      val span = g.groupBy("user_id").agg(
        count(lit(1)).as("n"), min("hour").as("h0"), max("hour").as("h1"))
      val sparse = span.filter(col("n") =!=
        (unix_timestamp(col("h1")) - unix_timestamp(col("h0"))) / 3600 + 1)
      assert(sparse.count() === 0, "grid not dense")
      // no value may be null (first grid row is an observed hour)
      assert(g.filter(col("value").isNull).count() === 0)
      // filled=false rows carry exactly the observed hourly mean
      val hourly = Tables.events(spark, sfDir)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(avg(col("value")).as("want"))
      val obs = g.filter(!col("filled")).join(hourly, Seq("user_id", "hour"))
      assert(obs.count() === hourly.count(), "observed rows != hourly groups")
      assert(obs.filter(abs(col("value") - col("want")) > 1e-9).count() === 0)
      // filled rows repeat the previous grid row's value (LOCF), checked
      // via an independent lag window
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("hour")
      val locf = g.withColumn("prev", lag(col("value"), 1).over(w))
        .filter(col("filled"))
        .filter(col("value") =!= col("prev"))
      assert(locf.count() === 0, "a filled row does not repeat its predecessor")
      // the fill actually exercises: some gaps exist in this data
      assert(g.filter(col("filled")).count() > 0)
    } finally g.unpersist()
  }

  private def hourlyRef(): Map[Long, Seq[(java.sql.Timestamp, Double)]] =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(avg(col("value")).as("v"))
      .filter(col("v").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1.getTime).toSeq).toMap

  test("q61 EWMA equals a driver-side fold over the hourly series") {
    val got = graft.operators.TimeSeries.ewma(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getTimestamp(2), r.getDouble(3))))
      .toMap
    val ref = hourlyRef()
    assert(got.keySet === ref.keySet)
    ref.foreach { case (u, series) =>
      val vs = series.map(_._2)
      val want = vs.tail.foldLeft(vs.head)((a, x) => 0.3 * x + 0.7 * a)
      val (n, last, e) = got(u)
      assert(n === vs.length, s"user $u n_hours")
      assert(last === series.last._1, s"user $u last_hour")
      assert(e === want, s"user $u: $e != $want") // exact: same fold order
    }
  }

  test("q62 anomalies equal a driver-side rolling z-score recompute") {
    val got = graft.operators.TimeSeries.anomalies(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val want = hourlyRef().flatMap { case (u, series) =>
      series.indices.flatMap { i =>
        val frame = series.slice(math.max(0, i - 24), i).map(_._2)
        val n = frame.length
        if (n < 12) None else {
          val mean = frame.sum / n
          val sd = math.sqrt(
            (frame.map(x => x * x).sum - n * mean * mean) / (n - 1))
          val z = (series(i)._2 - mean) / sd
          if (sd > 0 && math.abs(z) > 3.0)
            Some((u, series(i)._1) -> ((series(i)._2, z)))
          else None
        }
      }
    }
    assert(got.keySet === want.keySet)
    // values agree to float tolerance (frame sums may associate
    // differently between the window exec and this sequential fold)
    got.foreach { case (k, (v, z)) =>
      val (wv, wz) = want(k)
      assert(math.abs(v - wv) < 1e-9 && math.abs(z - wz) < 1e-6, s"$k")
    }
    assert(got.nonEmpty, "no anomalies flagged on this corpus")
  }

  test("w10 multi-touch attribution conserves purchase mass over attributable purchases") {
    import org.apache.spark.sql.functions._
    val got = graft.streaming.EventsWindows
      .multiTouchAttribution(spark, sfDir).collect()
    assert(got.nonEmpty)
    val attributed = got.map(_.getDouble(2)).sum
    // mass: the summed credits equal the total value of purchases that
    // HAVE at least one click in the preceding window (each such
    // purchase splits its value into parts summing back to the value,
    // modulo the per-credit DECIMAL(18,6) rounding)
    val e = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val buys = e.filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"),
        col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val attributable = buys.join(clicks,
        col("user_id") === col("cu") && col("cts") <= col("pts") &&
          col("cts") > col("pts") - expr("INTERVAL 30 MINUTES"), "left_semi")
      .agg(sum(col("value"))).head().getDouble(0)
    // bound scales with the attributed-touch count (r12 advice): each
    // credit is rounded to DECIMAL(18,6), worst case 0.5e-6 absolute
    // per touch, so a fixed tolerance flakes once a corpus has enough
    // attributed clicks — allow 1e-6 per touch plus float slack
    val nTouches = got.map(_.getLong(1)).sum
    assert(math.abs(attributed - attributable) < nTouches * 1e-6 + 1e-9,
      s"$attributed vs $attributable over $nTouches touches")
    // touch counts are positive and hourly rows are distinct hours
    assert(got.map(_.getLong(1)).forall(_ > 0))
    assert(got.map(_.get(0)).distinct.length === got.length)
  }

  test("q73 z-order buckets bound BOTH dimensions; an hour-sorted layout bounds only one") {
    import org.apache.spark.sql.functions._
    val buckets = graft.operators.TimeSeries.zorderStats(spark, sfDir).collect()
    assert(buckets.length > 8, "normalized interleave must spread buckets")
    val ev = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        expr("unix_millis(ts) div 3600000").as("h"))
    val (minU, maxU, minH, maxH) = ev
      .agg(min("user_id"), max("user_id"), min("h"), max("h")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
    // counts partition the corpus
    assert(buckets.map(_.getLong(1)).sum === ev.count())
    // every z-bucket's span is a strict fraction of the global span in
    // BOTH dims (top-5-bit cut fixes >= 3 leading bits of one dim and
    // >= 2 of the other)
    val uSpans = buckets.map(r => r.getLong(3) - r.getLong(2))
    val hSpans = buckets.map(r => r.getLong(5) - r.getLong(4))
    assert(uSpans.forall(_ <= (maxU - minU) / 4 + 1), uSpans.mkString(","))
    assert(hSpans.forall(_ <= (maxH - minH) / 2 + 1), hSpans.mkString(","))
    // contrast: cut an HOUR-SORTED layout into 32 equal-width hour
    // slices — time is bounded but the user span stays ~global
    val hourSliced = ev
      .withColumn("b", expr(s"(h - $minH) * 32 div greatest(${maxH - minH} + 1, 1)"))
      .groupBy("b").agg((max("user_id") - min("user_id")).as("us"))
      .collect().map(_.getLong(1))
    assert(hourSliced.max > (maxU - minU) * 9 / 10,
      "hour-sorted slices should NOT bound the user dimension")
  }
}
