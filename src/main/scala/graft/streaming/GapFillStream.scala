package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One emitted grid row of the streaming gap-fill: `hour_ms` is the
  * hour bucket's epoch-millis start, `filled` marks LOCF rows.
  */
case class GapRow(user_id: Long, hour_ms: Long, value: Double,
    filled: Boolean)

/** q60's streaming form — per-user hourly LOCF series over a live
  * event feed, built on the state API v2's EVENT-TIME TIMERS (the one
  * arbitrary-state facility the other streaming operators don't
  * exercise: dedup/cap use unkeyed-time state, sessionization uses
  * timeouts; here the operator must act at a specific event-time
  * instant — the close of each observed hour — which is exactly
  * `registerTimer` + `handleExpiredTimer` under `TimeMode.EventTime`).
  *
  * Mechanics: input rows accumulate (sum, count) per open hour in a
  * MapState, and each observed hour registers a timer at its end.
  * When the watermark passes an hour's end the timer fires and the
  * hour CLOSES: the processor first back-fills every hour between the
  * previously closed hour and this one with the last closed mean
  * (filled=true — the catch-up formulation: fills are emitted only
  * BETWEEN observations, matching batch gapFill's grid, never chained
  * past the final observation into unbounded zombie timers), then
  * emits the observed hour's mean (filled=false) and becomes the new
  * carry value.
  *
  * State bound per user: the open-hour map holds only hours inside
  * the watermark delay, plus one (hour, mean) carry pair — O(delay),
  * not O(history). LATE ROWS ARE FILTERED BY THE PROCESSOR ITSELF:
  * unlike windowed aggregations, `transformWithState` applies NO
  * automatic watermark filter to input rows (verified against the
  * Spark 4.1 exec: `TimerValuesImpl` is built from
  * `eventTimeWatermarkForEviction` and the late-data predicate is
  * never evaluated) — so [[handleInputRows]] drops any row whose hour
  * already ended at or before the current watermark, i.e. whose
  * close-timer has or would have fired. Without this, a late row
  * re-opens a closed hour, contaminates its mean or re-emits its grid
  * row, and regresses the LOCF carry backward. Defense in depth on
  * top: [[handleExpiredTimer]] discards any close at or before the
  * already-emitted carry hour. Emission is append-only as hours
  * close; rows after the stream's final watermark stay unemitted (the
  * spec allows exactly that tail).
  */
class GapFillProcessor
    extends StatefulProcessor[Long, (Long, Long, Double), GapRow] {
  private val HourMs = 3600L * 1000L
  @transient private var open:
    org.apache.spark.sql.streaming.MapState[Long, (Double, Long)] = _
  @transient private var lastClosed:
    org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

  override def init(out: OutputMode, tm: TimeMode): Unit = {
    open = getHandle.getMapState[Long, (Double, Long)]("open",
      Encoders.scalaLong,
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong),
      TTLConfig.NONE)
    lastClosed = getHandle.getValueState[(Long, Double)]("last",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      TTLConfig.NONE)
  }

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, Long, Double)],
      tv: TimerValues): Iterator[GapRow] = {
    val wm = tv.getCurrentWatermarkInMs()
    rows.foreach { case (_, hourMs, v) =>
      // the windowed-agg late contract, applied manually (see class
      // doc): an hour that closed at or before the current watermark
      // never re-opens
      if (hourMs + HourMs > wm) {
        val (s0, c0) =
          if (open.containsKey(hourMs)) open.getValue(hourMs) else (0.0, 0L)
        open.updateValue(hourMs, (s0 + v, c0 + 1))
        // idempotent per hour: a re-registered duplicate timer either
        // coalesces or fires into an already-closed hour and no-ops
        getHandle.registerTimer(hourMs + HourMs)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[GapRow] = {
    val hour = info.getExpiryTimeInMs - HourMs
    if (!open.containsKey(hour)) return Iterator.empty // already closed
    // guard: never close at or before the emitted carry — a watermark-
    // evading late row that re-opened a closed hour is discarded here
    // instead of duplicating its grid row / regressing the carry
    if (lastClosed.exists() && hour <= lastClosed.get()._1) {
      open.removeKey(hour)
      return Iterator.empty
    }
    val (s, c) = open.getValue(hour)
    open.removeKey(hour)
    val mean = s / c
    val fills: Iterator[GapRow] =
      if (lastClosed.exists()) {
        val (prevHour, prevMean) = lastClosed.get()
        ((prevHour + HourMs) until hour by HourMs).iterator
          .map(h => GapRow(user, h, prevMean, filled = true))
      } else Iterator.empty
    lastClosed.update((hour, mean))
    fills ++ Iterator(GapRow(user, hour, mean, filled = false))
  }
}

object GapFillStream {

  /** Wire the processor over a watermarked raw event stream
    * (`streamEvents` must carry ts/user_id/value). Returns the
    * append-mode grid-row stream.
    */
  def gapFillStream(streamEvents: DataFrame,
      delay: String = "30 minutes"): DataFrame = {
    val s = streamEvents.sparkSession
    import s.implicits._
    streamEvents
      .withWatermark("ts", delay)
      // null key/time/value rows are dropped BEFORE the tuple encoder,
      // whose primitive fields would otherwise kill the stream on the
      // first dirty row. Declared divergence from batch q60 on
      // null-VALUE rows: batch still counts such an hour as a grid
      // point (its null avg extends the span and LOCF-fills it);
      // here an hour whose only events carry null values never opens —
      // a stream cannot mean-fill from an hour with no usable sample
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      // hour bucket via date_trunc, NOT floor(unix/3600): batch q60
      // buckets in the session timezone, and in a non-whole-hour-offset
      // zone UTC epoch-hours would put stream and batch on different
      // grids
      .select(col("user_id").cast("long"),
        unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        col("value").cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new GapFillProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
