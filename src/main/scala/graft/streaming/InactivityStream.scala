package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One inactivity alert: the user went `gap` ms without an event after
  * `last_seen_ms`; the alert fires when the watermark passes
  * `alert_ms` = last_seen_ms + gap.
  */
case class InactivityAlert(user_id: Long, last_seen_ms: Long,
    alert_ms: Long)

/** w9's streaming form — the TIMEOUT-TIMER pattern: an alert that
  * fires on the ABSENCE of events, which no window or join can
  * express (they all trigger on rows that exist; this triggers on
  * rows that don't). Each user's state is one long (last-seen event
  * time); every new maximum re-arms the user's single timer at
  * last_seen + gap, DELETING the previously armed one, and a timer
  * that survives to its expiry — meaning no newer event arrived —
  * emits the alert as the watermark passes it. A user who returns
  * after an alert re-arms and can alert again on a later silence:
  * alerts are per-silence, not per-user.
  *
  * Late rows (transformWithState applies NO automatic watermark
  * filter — the GapFill lesson): a row at or below the current
  * watermark can only LOWER the silence estimate if it were allowed
  * to rewind last_seen, and it can never un-fire an already-correct
  * alert; rows that do not advance the stored maximum are ignored,
  * which makes the processor insensitive to both late and
  * out-of-order arrivals within a batch.
  *
  * State per user: one (last_seen) long + one armed timer — O(1),
  * independent of history length; the churn-monitor deployment keeps
  * millions of keys at a few bytes each.
  */
class InactivityProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Long), InactivityAlert] {
  @transient private var lastSeen:
    org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(out: OutputMode, tm: TimeMode): Unit = {
    lastSeen = getHandle.getValueState[Long]("last_seen",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[InactivityAlert] = {
    val newMax = rows.map(_._2).max
    val prev = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    if (newMax > prev) {
      if (prev != Long.MinValue) getHandle.deleteTimer(prev + gapMs)
      lastSeen.update(newMax)
      getHandle.registerTimer(newMax + gapMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[InactivityAlert] = {
    // a stale timer (event arrived after it was armed) was deleted on
    // arrival; if one still fires concurrently, the guard drops it
    val last = lastSeen.get()
    if (last + gapMs != info.getExpiryTimeInMs) Iterator.empty
    else Iterator(InactivityAlert(user, last, info.getExpiryTimeInMs))
  }
}

object InactivityStream {

  /** Wire the processor over a watermarked raw event stream
    * (ts/user_id). `delay` is the watermark lateness bound; alerts for
    * a silence fire once the watermark (max seen ts − delay) passes
    * last_seen + gap.
    */
  def inactivityAlerts(streamEvents: DataFrame, gapHours: Int = 24,
      delay: String = "30 minutes"): DataFrame = {
    val s = streamEvents.sparkSession
    import s.implicits._
    streamEvents
      .withWatermark("ts", delay)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id").cast("long"), unix_millis(col("ts")))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new InactivityProcessor(gapHours * 3600000L),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
