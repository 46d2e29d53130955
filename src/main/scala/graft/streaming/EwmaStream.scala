package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One emitted row of the streaming EWMA: the hour's observed mean and
  * the smoothed level AFTER folding it in.
  */
case class EwmaRow(user_id: Long, hour_ms: Long, mean: Double,
    ewma: Double)

/** q61's streaming form — the per-user EWMA level updated live as each
  * hour CLOSES under the watermark (event-time timers, the gap-fill
  * machinery with a fold instead of a carry): rows accumulate (sum,
  * count) per open hour; when the watermark passes an hour's end its
  * timer fires, the hour's mean folds into the level
  * (level' = α·mean + (1−α)·level, seeded with the first closed
  * hour's mean — exactly batch q61's recurrence over the OBSERVED-hour
  * series, missing hours skipped), and the updated level is emitted.
  * The monitoring deployment shape: a dashboard subscribes to the
  * append stream and always holds each key's current smoothed level.
  *
  * State per user: the open-hour map (O(watermark delay)) plus ONE
  * (lastHour, level) pair — O(delay), not O(history), which is the
  * whole point vs re-running the batch fold per tick. Late-row policy
  * is [[GapFillProcessor]]'s, applied the same way and for the same
  * reason (transformWithState does no automatic late filtering): an
  * hour that closed at or before the current watermark never re-opens,
  * and the timer guard refuses to close at or before the folded-in
  * carry hour — a late row must never fold into the level twice or
  * out of order.
  */
class EwmaProcessor(alpha: Double)
    extends StatefulProcessor[Long, (Long, Long, Double), EwmaRow] {
  private val HourMs = 3600L * 1000L
  private val beta = 1.0 - alpha
  @transient private var open:
    org.apache.spark.sql.streaming.MapState[Long, (Double, Long)] = _
  @transient private var level:
    org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

  override def init(out: OutputMode, tm: TimeMode): Unit = {
    open = getHandle.getMapState[Long, (Double, Long)]("open",
      Encoders.scalaLong,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong),
      TTLConfig.NONE)
    level = getHandle.getValueState[(Long, Double)]("level",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      TTLConfig.NONE)
  }

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, Long, Double)],
      tv: TimerValues): Iterator[EwmaRow] = {
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
      info: ExpiredTimerInfo): Iterator[EwmaRow] = {
    val hour = info.getExpiryTimeInMs - HourMs
    if (!open.containsKey(hour)) return Iterator.empty // already closed
    if (level.exists() && hour <= level.get()._1) {
      open.removeKey(hour)
      return Iterator.empty
    }
    val (s, c) = open.getValue(hour)
    open.removeKey(hour)
    val mean = s / c
    val lv =
      if (level.exists()) alpha * mean + beta * level.get()._2 else mean
    level.update((hour, lv))
    Iterator(EwmaRow(user, hour, mean, lv))
  }
}

object EwmaStream {

  /** Wire the processor over a watermarked raw event stream
    * (ts/user_id/value). Hour bucketing shares gap-fill's
    * date_trunc-derived grid so batch q61 and this stream fold the
    * same hourly means.
    */
  def ewmaStream(streamEvents: DataFrame, alpha: Double = 0.3,
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
      .transformWithState(new EwmaProcessor(alpha),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
