package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One emitted leaderboard row: the closed hour, the type's rank within
  * it, and its event count.
  */
case class TopKRow(hour_ms: Long, rank: Int, event_type: String, n: Long)

/** w6's streaming form — the per-hour event-type leaderboard emitted as
  * each hour closes under the watermark. Rank windows are unsupported
  * on streams (a rank is only final when its window is), so the
  * leaderboard is a [[StatefulProcessor]] keyed by the HOUR itself:
  * state is one count per (hour, event_type) — bounded by the event-
  * type vocabulary, not the event volume — and the top-k sort happens
  * once per hour at close, over that bounded map, on the executor that
  * owns the key.
  *
  * This completes the w-family pattern: w8's streaming form trades
  * exactness for fixed state (HLL); here the per-key domain is already
  * fixed (event types are a schema-level vocabulary), so the stream
  * can afford EXACT counts and the close-time leaderboard equals batch
  * w6 row-for-row on the closed prefix (StreamingStateSpec asserts it).
  *
  * Late-row policy follows [[GapFillProcessor]]: transformWithState
  * applies no automatic watermark filter, so rows for hours at or
  * under the watermark are dropped manually, and a closed-flag guard
  * keeps a straggler that slips the filter (same-batch watermark
  * advance) from re-opening an emitted hour with a partial recount.
  */
class TopKProcessor(k: Int)
    extends StatefulProcessor[Long, (Long, String), TopKRow] {
  private val HourMs = 3600L * 1000L
  @transient private var counts:
    org.apache.spark.sql.streaming.MapState[String, Long] = _
  @transient private var closed:
    org.apache.spark.sql.streaming.ValueState[Boolean] = _

  override def init(out: OutputMode, tm: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    closed = getHandle.getValueState[Boolean]("closed",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(hourMs: Long,
      rows: Iterator[(Long, String)],
      tv: TimerValues): Iterator[TopKRow] = {
    if (closed.exists()) return Iterator.empty
    val wm = tv.getCurrentWatermarkInMs()
    if (hourMs + HourMs <= wm) return Iterator.empty // late: hour closed
    var any = false
    rows.foreach { case (_, et) =>
      val c = if (counts.containsKey(et)) counts.getValue(et) else 0L
      counts.updateValue(et, c + 1)
      any = true
    }
    if (any) getHandle.registerTimer(hourMs + HourMs)
    Iterator.empty
  }

  override def handleExpiredTimer(hourMs0: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[TopKRow] = {
    val hour = info.getExpiryTimeInMs - HourMs
    if (closed.exists()) return Iterator.empty
    val all = counts.iterator().map(p => (p._1, p._2)).toSeq
    counts.clear()
    closed.update(true)
    // batch w6's ordering verbatim: count desc, event_type asc tiebreak
    all.sortBy { case (et, n) => (-n, et) }
      .take(k).zipWithIndex
      .map { case ((et, n), i) => TopKRow(hour, i + 1, et, n) }
      .iterator
  }
}

object TopKStream {

  /** Wire the processor over a watermarked raw event stream, sharing
    * the date_trunc hour grid of the other streaming mirrors.
    */
  def windowTopKStream(streamEvents: DataFrame, k: Int = 3,
      delay: String = "30 minutes"): DataFrame = {
    val s = streamEvents.sparkSession
    import s.implicits._
    streamEvents
      .withWatermark("ts", delay)
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .select(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TopKProcessor(k),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
