package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** The native as-of join (custom LogicalPlan → AsOfJoinExec): planted
  * truth, null semantics, left-outer totality, plan shape, and the
  * corpus-level agreement with an independent window recompute.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def ts(s: String) = Timestamp.valueOf(s)

  test("planted: picks the last right row at-or-before, per key, left-outer") {
    import spark.implicits._
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")), // after two quotes
      (2L, "A", ts("2024-01-01 09:00:00")), // exactly at a quote (inclusive)
      (3L, "A", ts("2024-01-01 08:00:00")), // before every quote
      (4L, "B", ts("2024-01-01 10:00:00")), // other key
      (5L, "C", ts("2024-01-01 10:00:00")), // key with no quotes
      (6L, null, ts("2024-01-01 10:00:00")), // null key
      (7L, "A", null)                        // null ts
    ).toDF("trade_id", "sym", "tts")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1.0),
      ("A", ts("2024-01-01 09:30:00"), 2.0),
      ("B", ts("2024-01-01 09:45:00"), 3.0),
      (null.asInstanceOf[String], ts("2024-01-01 08:00:00"), 9.0), // skipped
      ("A", null.asInstanceOf[Timestamp], 9.0)                     // skipped
    ).toDF("qsym", "qts", "px")
    val got = TemporalJoins
      .asOfJoinNative(trades, quotes, "sym", "qsym", "tts", "qts")
      .select(col("trade_id"), col("px"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(
      1L -> Some(2.0),  // 09:30 quote
      2L -> Some(1.0),  // inclusive: 09:00 quote at equal ts
      3L -> None, 4L -> Some(3.0), 5L -> None, 6L -> None, 7L -> None))
  }

  test("corpus: native as-of equals an independent window recompute (inclusive)") {
    // recompute with the q35 window trick adjusted to INCLUSIVE
    // semantics: order by (ts, is_purchase) so a same-ts click sorts
    // BEFORE the purchase and the unbounded-to-previous-row frame
    // still sees it
    val e = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), (col("event_type") === "purchase").cast("int"),
        col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = e
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("event_id"), col("last_click_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    val got = TemporalJoins.asOfNativeEvents(spark, sfDir)
      .filter(col("user_id").isNotNull && col("purchase_ts").isNotNull)
      .select(col("event_id"), col("last_click_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(got.nonEmpty && got === want)
    // left-outer totality: every purchase row survives
    val nPurchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(TemporalJoins.asOfNativeEvents(spark, sfDir).count() === nPurchases)
  }

  test("planted FORWARD: first right row at-or-after, per key; tolerance nulls far matches") {
    import spark.implicits._
    val trades = Seq(
      (1L, "A", ts("2024-01-01 08:00:00")), // before both quotes → 09:00
      (2L, "A", ts("2024-01-01 09:00:00")), // exactly at a quote (inclusive)
      (3L, "A", ts("2024-01-01 09:10:00")), // between → 09:30
      (4L, "A", ts("2024-01-01 10:00:00")), // after every quote → none
      (5L, "B", ts("2024-01-01 08:00:00")), // other key, 1h45m gap
      (6L, "C", ts("2024-01-01 08:00:00"))  // key with no quotes
    ).toDF("trade_id", "sym", "tts")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1.0),
      ("A", ts("2024-01-01 09:30:00"), 2.0),
      ("B", ts("2024-01-01 09:45:00"), 3.0)
    ).toDF("qsym", "qts", "px")
    def run(tol: Option[Long]) = TemporalJoins
      .asOfJoinNative(trades, quotes, "sym", "qsym", "tts", "qts",
        direction = "forward", tolerance = tol)
      .select(col("trade_id"), col("px"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(run(None) === Map(
      1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> None, 5L -> Some(3.0), 6L -> None))
    // 1h tolerance: trade 1 (exactly 1h gap, inclusive) keeps its
    // match; trade 5 (1h45m) loses it
    val hourMicros = 3600L * 1000000
    assert(run(Some(hourMicros)) === Map(
      1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("planted BACKWARD tolerance: the last-at-or-before match nulls beyond the window") {
    import spark.implicits._
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")), // 30m after 09:30 quote
      (2L, "A", ts("2024-01-01 12:00:00"))  // 2h30m after → out of 1h window
    ).toDF("trade_id", "sym", "tts")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:30:00"), 2.0)
    ).toDF("qsym", "qts", "px")
    val got = TemporalJoins
      .asOfJoinNative(trades, quotes, "sym", "qsym", "tts", "qts",
        tolerance = Some(3600L * 1000000))
      .select(col("trade_id"), col("px"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(1L -> Some(2.0), 2L -> None))
  }

  test("corpus FORWARD: native equals an independent window recompute") {
    // recompute q80's question with a window: per user, the NEXT
    // purchase ts at-or-after each click. INCLUSIVE forward semantics:
    // a purchase at exactly the click's ts matches, so same-ts
    // purchases must sort AFTER the click to land in the (1, following)
    // frame — order by (ts, is_purchase). Then the 2h tolerance as a
    // null-out.
    val e = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), (col("event_type") === "purchase").cast("int"),
        col("event_id"))
      .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val nxt = first(when(col("event_type") === "purchase", col("ts")),
      ignoreNulls = true)
    val want = e
      .withColumn("next_purchase_raw", nxt.over(w))
      .filter(col("event_type") === "click" && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .withColumn("next_purchase_ts",
        when(col("next_purchase_raw") <=
          col("ts") + expr("INTERVAL 2 HOURS"), col("next_purchase_raw")))
      .select(col("event_id"), col("next_purchase_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    val got = TemporalJoins.asOfForwardEvents(spark, sfDir)
      .filter(col("user_id").isNotNull && col("click_ts").isNotNull)
      .select(col("event_id"), col("next_purchase_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(got.nonEmpty && got === want)
  }

  test("plan: AsOfJoinExec with per-side sort, no pair blow-up operators") {
    val df = TemporalJoins.asOfNativeEvents(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings; the
    // AQE wrapper hides the node from executedPlan.exists, so pin the
    // rendered tree (which AQE prints in full)
    assert(plan.contains("AsOfJoin "), s"native exec not planned:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // each side gets its own (key, ts) sort below the exec — the
    // per-side ordering a pre-sorted table could satisfy for free
    assert("(?m)^.*Sort .*".r.findAllIn(plan).size >= 2, plan)
  }
}
