package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One emitted row of the streaming funnel: a user completing a step.
  * `ts_us` is the step's event time in microseconds — full parquet
  * precision, because batch q64's `>=` comparisons are on microsecond
  * timestamps and a millisecond truncation could flip a tie.
  */
case class FunnelStepRow(user_id: Long, step: Int, event_type: String,
    ts_us: Long)

/** q64's streaming form — the per-user view→click→purchase state
  * machine advanced live as events close under the watermark. Events
  * buffer per user until the watermark passes their timestamp, then
  * fold IN EVENT-TIME ORDER (ties: view before click before purchase,
  * so a click at the exact timestamp of the view that enables it
  * counts — batch q64's `>=`): the first view sets step 1, the first
  * click at-or-after it sets step 2, the first purchase at-or-after
  * that sets step 3. Each transition is emitted once, when it becomes
  * final. Folding in watermark-released order makes the stream equal
  * the batch conditional-min chain over the closed prefix: an
  * arriving event is kept only if its time is at-or-past the current
  * watermark, every earlier release happened strictly below it, so
  * the fold sees a globally time-sorted sequence per user.
  *
  * State per user: the open-event buffer (O(watermark delay) — only
  * the three step types are buffered, everything else is filtered
  * before the shuffle) plus one (v, c, p) triple; a completed user
  * drops their buffer and ignores all further input, so the long-run
  * state of a converted user is three longs. Late rows (below the
  * watermark on arrival) are dropped in-processor —
  * [[GapFillProcessor]]'s policy, same reason: transformWithState
  * does no automatic late filtering, and a late view folded out of
  * order could rewrite an already-emitted chain.
  */
class FunnelProcessor
    extends StatefulProcessor[Long, (Long, Long, Int), FunnelStepRow] {
  private val Steps = Array("view", "click", "purchase")
  private val None_ = -1L
  @transient private var open:
    org.apache.spark.sql.streaming.MapState[Long, Long] = _
  @transient private var prog:
    org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _

  override def init(out: OutputMode, tm: TimeMode): Unit = {
    open = getHandle.getMapState[Long, Long]("open",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    prog = getHandle.getValueState[(Long, Long, Long)]("prog",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong),
      TTLConfig.NONE)
  }

  private def tsMsOf(tsUs: Long): Long = Math.floorDiv(tsUs, 1000L)

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, Long, Int)],
      tv: TimerValues): Iterator[FunnelStepRow] = {
    val wm = tv.getCurrentWatermarkInMs()
    val done = prog.exists() && prog.get()._3 != None_
    if (!done) rows.foreach { case (_, tsUs, ord) =>
      // keep only rows not yet closed by the watermark (late → drop)
      if (tsMsOf(tsUs) >= wm) {
        // composite key sorts by (ts, step order): ties fold
        // view → click → purchase, matching batch `>=` semantics
        open.updateValue(tsUs * 4 + ord, 0L)
        getHandle.registerTimer(tsMsOf(tsUs) + 1)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[FunnelStepRow] = {
    val wm = tv.getCurrentWatermarkInMs()
    var (v, c, p) =
      if (prog.exists()) prog.get() else (None_, None_, None_)
    if (p != None_) return Iterator.empty
    val due = open.keys().filter(k => tsMsOf(k / 4) < wm).toArray.sorted
    if (due.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer[FunnelStepRow]()
    due.foreach { k =>
      val tsUs = k / 4
      (k % 4).toInt match {
        case 0 if v == None_ =>
          v = tsUs; out += FunnelStepRow(user, 1, Steps(0), tsUs)
        case 1 if v != None_ && c == None_ && tsUs >= v =>
          c = tsUs; out += FunnelStepRow(user, 2, Steps(1), tsUs)
        case 2 if c != None_ && p == None_ && tsUs >= c =>
          p = tsUs; out += FunnelStepRow(user, 3, Steps(2), tsUs)
        case _ => ()
      }
      open.removeKey(k)
    }
    if (p != None_) open.clear() // converted: buffer is dead weight
    prog.update((v, c, p))
    out.iterator
  }
}

object FunnelStream {

  /** Wire the processor over a watermarked raw event stream
    * (ts/user_id/event_type). Only the three funnel step types cross
    * the shuffle; everything else is filtered at the scan.
    */
  def funnelStream(streamEvents: DataFrame,
      delay: String = "30 minutes"): DataFrame = {
    val s = streamEvents.sparkSession
    import s.implicits._
    streamEvents
      .withWatermark("ts", delay)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === "view", 0)
          .when(col("event_type") === "click", 1)
          .otherwise(2).as("ord"))
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .transformWithState(new FunnelProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
