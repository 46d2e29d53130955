package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One emitted anomaly: the hour's observed mean and its z-score
  * against the user's trailing baseline at close time.
  */
case class AnomalyRow(user_id: Long, hour_ms: Long, value: Double,
    zscore: Double)

/** The bounded trailing-means ring, wrapped so the state encoder is a
  * plain product encoder.
  */
case class MeanRing(xs: List[Double])

/** q62's streaming form — live anomaly alerts as hours close under the
  * watermark. State per user: the open-hour (sum, count) map plus a
  * bounded ring of the last `lookback` CLOSED hourly means (one
  * [[MeanRing]] value, oldest dropped on append — O(lookback), not
  * O(history)). When an
  * hour closes, its mean is scored against the CURRENT ring (the
  * trailing baseline, point-under-test excluded — batch q62's frame
  * exactly), an [[AnomalyRow]] is emitted if the baseline has at least
  * `minN` points and |z| exceeds the threshold, and the mean then
  * joins the ring.
  *
  * The z arithmetic is batch q62's expression tree — explicit n, Σx,
  * Σx² — so a closed hour flags HERE iff it flags in the batch query
  * (StreamingStateSpec asserts set equality over the closed prefix).
  * Late-row policy is [[GapFillProcessor]]'s manual filter + in-order
  * close guard, for the same reasons.
  */
class AnomalyProcessor(lookback: Int, minN: Int, zThresh: Double)
    extends StatefulProcessor[Long, (Long, Long, Double), AnomalyRow] {
  private val HourMs = 3600L * 1000L
  @transient private var open:
    org.apache.spark.sql.streaming.MapState[Long, (Double, Long)] = _
  @transient private var ring:
    org.apache.spark.sql.streaming.ValueState[MeanRing] = _
  @transient private var lastClosed:
    org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(out: OutputMode, tm: TimeMode): Unit = {
    open = getHandle.getMapState[Long, (Double, Long)]("open",
      Encoders.scalaLong,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong),
      TTLConfig.NONE)
    ring = getHandle.getValueState[MeanRing]("ring",
      Encoders.product[MeanRing], TTLConfig.NONE)
    lastClosed = getHandle.getValueState[Long]("last",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, Long, Double)],
      tv: TimerValues): Iterator[AnomalyRow] = {
    val wm = tv.getCurrentWatermarkInMs()
    rows.foreach { case (_, hourMs, v) =>
      if (hourMs + HourMs > wm) {
        val (s0, c0) =
          if (open.containsKey(hourMs)) open.getValue(hourMs) else (0.0, 0L)
        open.updateValue(hourMs, (s0 + v, c0 + 1))
        getHandle.registerTimer(hourMs + HourMs)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[AnomalyRow] = {
    val hour = info.getExpiryTimeInMs - HourMs
    if (!open.containsKey(hour)) return Iterator.empty
    if (lastClosed.exists() && hour <= lastClosed.get()) {
      open.removeKey(hour)
      return Iterator.empty
    }
    val (s, c) = open.getValue(hour)
    open.removeKey(hour)
    lastClosed.update(hour)
    val mean = s / c
    val base = if (ring.exists()) ring.get().xs else Nil
    // append newest at the tail, evict from the head — the ring holds
    // the trailing `lookback` means in close order
    ring.update(MeanRing((base :+ mean).takeRight(lookback)))
    val n = base.length
    if (n < minN) return Iterator.empty
    // batch q62's expression tree, verbatim: mean over the frame, then
    // (Σx² − n·m·m)/(n−1) under a sqrt, then (x − m)/sd
    val fm = base.sum / n
    val sd = math.sqrt(math.max(
      (base.map(x => x * x).sum - n * fm * fm) / (n - 1), 0.0))
    if (sd <= 0) return Iterator.empty
    val z = (mean - fm) / sd
    if (math.abs(z) > zThresh) Iterator(AnomalyRow(user, hour, mean, z))
    else Iterator.empty
  }
}

object AnomalyStream {

  /** Wire the processor over a watermarked raw event stream
    * (ts/user_id/value), sharing gap-fill's date_trunc hour grid.
    */
  def anomalyStream(streamEvents: DataFrame, lookback: Int = 24,
      minN: Int = 12, zThresh: Double = 3.0,
      delay: String = "30 minutes"): DataFrame = {
    val s = streamEvents.sparkSession
    import s.implicits._
    streamEvents
      .withWatermark("ts", delay)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id").cast("long"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new AnomalyProcessor(lookback, minN, zThresh),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
