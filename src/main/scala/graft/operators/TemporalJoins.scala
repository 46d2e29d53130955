package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators — the join categories the reference lacks
  * entirely (SURVEY.md §2.3: range joins, as-of joins), built Spark-
  * first:
  *
  *  - rangeJoin: event pairs within a time window, via LOSSLESS
  *    interval blocking — both sides bucket to fixed-width time cells;
  *    a pair within `maxGap` spans at most adjacent cells, so
  *    replicating one side to (cell, cell+1) and equi-joining on
  *    (user, cell) finds every qualifying pair without the quadratic
  *    theta-join. The equi-join shuffles on (user, cell) — scalable.
  *
  *  - asOfJoin: most-recent-prior match per row, with NO join at all —
  *    one window pass per user ordered by (ts, event_id) carrying the
  *    last qualifying timestamp forward (rows-frame ending at
  *    1 PRECEDING = strictly prior rows). This is the linear-scan
  *    formulation: one shuffle on user_id, no candidate explosion.
  *
  * Timestamps are compared at microsecond precision (Spark's
  * TimestampType); the DuckDB oracles cast their nanosecond column
  * down identically.
  */
object TemporalJoins {

  /** Pairs of same-user events where 0 < ts_b - ts_a <= maxGapSec,
    * aggregated per user. Interval blocking with 1-minute cells.
    */
  def rangeJoin(s: SparkSession, dir: String, maxGapSec: Int = 60): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("ts").cast("double").as("sec"))
    val cell = (c: org.apache.spark.sql.Column) =>
      floor(c / lit(maxGapSec.toDouble)).cast("long")
    // left side replicated to its own cell and the next one
    val a = e.select(col("user_id"), col("event_id").as("id_a"),
        col("sec").as("sec_a"),
        explode(array(cell(col("sec")), cell(col("sec")) + 1)).as("cell"))
    val b = e.select(col("user_id"), col("event_id").as("id_b"),
      col("sec").as("sec_b"), cell(col("sec")).as("cell"))
    a.join(b, Seq("user_id", "cell"))
      .filter(col("sec_b") > col("sec_a") &&
        col("sec_b") - col("sec_a") <= maxGapSec)
      .select(col("user_id"), col("id_a"), col("id_b"),
        (col("sec_b") - col("sec_a")).as("gap_s"))
      // no distinct needed: cell_b is one value, the two replicas are
      // distinct cells — each qualifying pair matches exactly once
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), avg(col("gap_s")).as("avg_gap_s"))
      .orderBy(col("user_id"))
  }

  /** As-of join: for every purchase event, the user's most recent
    * strictly-prior click (by (ts, event_id) order), as a window
    * carry-forward — no join.
    * Output: (event_id, user_id, purchase_ts, last_click_ts).
    */
  def asOfJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("last_click_ts"))
      .orderBy(col("event_id"))
  }

  /** Native as-of join between TWO relations through the custom
    * Catalyst operator ([[org.apache.spark.sql.graft.AsOfJoinPlan]] →
    * `AsOfJoinExec`, injected by GraftExtensions): for every left row,
    * the LAST right row of the same key with rightTs <= leftTs
    * (inclusive), LEFT OUTER. Columns are addressed by name against
    * each side's analyzed output; sides must not share column names.
    */
  def asOfJoinNative(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    def attr(df: DataFrame, name: String) =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asOfJoinNative: no column '$name' in ${df.columns.mkString(",")}"))
    org.apache.spark.sql.graft.Shims.ofRows(left.sparkSession,
      org.apache.spark.sql.graft.AsOfJoinPlan(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        attr(left, leftKey), attr(right, rightKey),
        attr(left, leftTs), attr(right, rightTs),
        direction, tolerance))
  }

  /** q77 — q35's question through the NATIVE as-of join: each purchase
    * joined to the user's last click at-or-before it, as a genuine
    * two-relation join (purchases ⟕asof clicks) instead of the q35
    * union-and-carry window. Inclusive semantics (a click at exactly
    * the purchase timestamp matches) — q35 keeps its strictly-prior
    * contract; both are standard as-of variants. Output carries only
    * the matched TIMESTAMP, so same-ts click ties (which an as-of join
    * resolves arbitrarily among equal keys) cannot make the result
    * nondeterministic. Oracle: DuckDB's own `ASOF LEFT JOIN` — the
    * rare case where the oracle engine has the operator natively.
    *
    * Scale posture (why the native operator earns its place): the
    * window form sorts the UNION of both relations on one (key, ts)
    * axis; the native exec co-partitions each side on its key and
    * sorts each side separately — so a right side that is already
    * bucketed/sorted (the 100 TB quotes-table layout) skips its sort
    * and shuffle entirely, and the merge is O(|L|+|R|) with one
    * buffered row of state. Design A/B record (r14, standalone
    * min-of-3 at sf0.1 events ×100 — a historical decision record,
    * not a current-artifact claim; current numbers live in the bench
    * artifact): the native exec beat the window form ~1.4× — the
    * per-side sorts beat the union sort even with NEITHER side
    * pre-laid-out — and the unsafe-projected key path (AsOfJoinExec,
    * r13 verdict #3) was worth a further ~12% over the interpreted
    * eval it replaced, before any layout help.
    */
  def asOfNativeEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    asOfJoinNative(purchases, clicks, "user_id", "c_user", "ts", "c_ts")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("c_ts").as("last_click_ts"))
      .orderBy(col("event_id"))
  }

  /** q80 — the FORWARD + TOLERANCE variant through the same native
    * operator: each click joined to the user's NEXT purchase, but only
    * if it lands within 2 hours (the conversion-attribution window) —
    * pandas `merge_asof(direction="forward", tolerance=...)` semantics
    * as one O(|L|+|R|) co-partitioned merge. Inclusive at equality on
    * both engines; only the matched TIMESTAMP is emitted, so same-ts
    * purchase ties stay deterministic (q77's convention). Oracle:
    * DuckDB's native forward ASOF (`c.ts <= p.p_ts` picks the smallest
    * p_ts ≥ c.ts) with the tolerance applied as a CASE on the matched
    * timestamp — null-extending beyond-window matches exactly like the
    * exec's tolerance check.
    */
  def asOfForwardEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    asOfJoinNative(clicks, buys, "user_id", "p_user", "ts", "p_ts",
        direction = "forward", tolerance = Some(2L * 3600 * 1000000))
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"),
        col("p_ts").as("next_purchase_ts"))
      .orderBy(col("event_id"))
  }

  /** q60 — time-series resample + gap-fill: each user's `value` series
    * regularized onto a dense hourly grid between that user's first
    * and last observed hour, with missing hours FORWARD-FILLED from
    * the last observed hourly mean (last-observation-carried-forward —
    * the standard irregular-to-regular preprocessing before any
    * sliding-window feature or sequence model sees the data; the
    * category SURVEY §2.3 lists as absent from the reference alongside
    * range/as-of joins). `filled` marks interpolated rows so
    * downstream can weight or drop them. Output: (user_id, hour,
    * value, filled).
    *
    * Scale posture: the hourly pre-aggregate is one (user, hour)
    * shuffle with map-side combine; the dense grid comes from
    * `sequence()` exploded off each user's 2-timestamp span row — grid
    * size is span-bounded per user, never corpus-quadratic — and joins
    * back on the SAME (user, hour) key (AQE reuses the
    * co-partitioning). The carry-forward is one per-user window pass
    * ordered by hour — per-key linear scan, same shape as asOfJoin,
    * parallel across users. Nothing global: a million users fan out; a
    * single user's series is one task's sequential scan, which is the
    * algorithm's inherent order dependence.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(avg(col("value")).as("v"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        last(col("v"), ignoreNulls = true).over(w).as("value"),
        col("v").isNull.as("filled"))
      .orderBy(col("user_id"), col("hour"))
  }
}
