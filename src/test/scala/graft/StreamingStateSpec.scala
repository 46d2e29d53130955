package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** The remaining Structured-Streaming surface: watermarked streaming
  * dedup and flatMapGroupsWithState custom state.
  */
class StreamingStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private lazy val srcDir: String = {
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "stream-state").toString
    // duplicate the stream on purpose: each event twice
    val ev = Tables.events(spark, sfDir)
    ev.unionAll(ev).write.mode("overwrite").parquet(d)
    d
  }

  test("streaming dropDuplicates with watermark removes replayed events") {
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val deduped = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy().count()
    val q = deduped.writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("dedup_out").head().getLong(0)
    assert(got === Tables.events(spark, sfDir).count())
  }

  test("exactDedupStream's watermarked branch dedups within the delay") {
    // Drives the dropDuplicatesWithinWatermark path: a doc feed with an
    // event-time column, duplicate texts arriving within the watermark
    // delay. Every duplicate fingerprint must collapse to one emission
    // (all rows land inside the delay window here); the emitted
    // (doc_id, fp) pairs must be genuine members of their content group.
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val rows = Seq(
      (1L, "alpha beta", ts(0)),
      (2L, "alpha beta", ts(1)),   // dup of 1, one minute later
      (3L, "gamma", ts(2)),
      (4L, "gamma", ts(3)),        // dup of 3
      (5L, "delta", ts(4)))
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "wmdedup").toString
    rows.toDF("doc_id", "text", "ts").coalesce(1)
      .write.mode("overwrite").parquet(d)
    val stream = spark.readStream
      .schema(rows.toDF("doc_id", "text", "ts").schema).parquet(d)
    val out = graft.operators.Dedup.exactDedupStream(
      stream, watermark = Some("ts" -> "1 hour"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("wmdedup_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("wmdedup_out")
    assert(got.count() === 3) // alpha-beta, gamma, delta — one each
    assert(got.select("fp").distinct().count() === 3)
    // emitted keepers are real members of their content group
    import graft.functions.TextFunctions.fingerprint
    val members = rows.toDF("doc_id", "text", "ts")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
    assert(got.join(members, Seq("doc_id", "fp")).count() === 3)
  }

  test("flatMapGroupsWithState: per-user running stats with custom state") {
    import spark.implicits._
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    // state = (count, sum); emit one row per group per batch
    val stats = stream.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[(Long, Double)],
            state: GroupState[(Long, Double)]) => {
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          var c = c0; var s = s0
          rows.foreach { r => c += 1; s += r._2 }
          state.update((c, s))
          Iterator((uid, c, s))
        })
      .toDF("user_id", "n", "total")
    val q = stats.writeStream.outputMode("update")
      .format("memory").queryName("state_stats_out").start()
    try { q.processAllAvailable() } finally q.stop()
    // single micro-batch: final update per user == batch aggregate over
    // the DOUBLED source
    val got = spark.table("state_stats_out")
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n"), max(col("total")).as("total"))
    val want = spark.read.parquet(srcDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val joined = got.as("g").join(want.as("b"), Seq("user_id"), "full_outer")
    assert(joined.filter(col("g.n").isNull || col("b.n").isNull ||
      col("g.n") =!= col("b.n") ||
      abs(col("g.total") - col("b.total")) > 1e-6).count() === 0)
  }

  test("EventTimeTimeout sessionization equals batch w3 sessions") {
    // session_window reimplemented on the RAW custom-state API — the
    // shape a pipeline needs when per-session logic outgrows the
    // built-in (e.g. emitting mid-session signals): fold each user's
    // events into gap-separated sessions, emit closed sessions as data
    // arrives, PARK the still-open tail session in GroupState with an
    // event-time timeout at its end, and emit it only when the
    // WATERMARK — advanced here by a sentinel batch — proves it over
    // (hasTimedOut + state removal, the half of the API NoTimeout
    // leaves undriven). Must equal batch w3 row-for-row.
    import spark.implicits._
    val gapUs = 5 * 60000000L // w3's 5-minute inactivity gap, in MICROS —
    // event timestamps carry sub-millisecond precision, so the fold must
    // run at Spark's native micros or session bounds drift off batch w3
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val ev = Tables.events(spark, sfDir)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "sessstate").toString
    ev.write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(ev.schema).parquet(d)
    val sessions = stream.select(col("user_id"), col("ts"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[(Long, Long, Long)]) => { // (startUs, lastUs, n)
          if (state.hasTimedOut) {
            val (st, last, n) = state.get
            state.remove()
            Iterator((uid, st, last + gapUs, n))
          } else {
            val ts = rows.map(r => us(r._2)).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, Long)]
            var cur = state.getOption.getOrElse((ts.head, ts.head, 0L))
            for (t <- ts) {
              // same rule as session_window: an event at exactly
              // last + gap starts a NEW session
              if (t < cur._2 + gapUs || cur._3 == 0L)
                cur = (cur._1, math.max(cur._2, t), cur._3 + 1)
              else {
                closed += ((uid, cur._1, cur._2 + gapUs, cur._3))
                cur = (t, t, 1L)
              }
            }
            state.update(cur)
            // setTimeoutTimestamp takes MILLIS — round UP so the
            // timeout never fires a microsecond before the session end
            state.setTimeoutTimestamp((cur._2 + gapUs + 999L) / 1000L)
            closed.iterator
          }
        })
      .toDF("user_id", "start_us", "end_us", "n_events")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_state_out").start()
    try {
      q.processAllAvailable()
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 2L * 24 * 3600 * 1000)
      ev.limit(1)
        .withColumn("ts", lit(far))
        .withColumn("user_id", lit(-1L))
        .write.mode("append").parquet(d)
      q.processAllAvailable()
      // timed-out emissions can land in the no-data cleanup batch —
      // bounded wait on the expected row count
      val wantN = graft.streaming.EventsWindows.sessions(spark, sfDir).count()
      var tries = 0
      while (tries < 40 && spark.table("sess_state_out")
          .filter(col("user_id") >= 0).count() < wantN) {
        Thread.sleep(250); tries += 1
      }
    } finally q.stop()

    val got = spark.table("sess_state_out")
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        expr("timestamp_micros(start_us)").as("session_start"),
        expr("timestamp_micros(end_us)").as("session_end"),
        col("n_events"))
    val want = graft.streaming.EventsWindows.sessions(spark, sfDir)
    assert(want.count() > 0)
    val joined = got.as("g").join(want.as("b"),
      Seq("user_id", "session_start"), "full_outer")
    assert(joined.filter(col("g.n_events").isNull || col("b.n_events").isNull ||
      col("g.n_events") =!= col("b.n_events") ||
      col("g.session_end") =!= col("b.session_end")).count() === 0)
  }

  test("transformWithState (state API v2) per-user stats match batch") {
    // Spark 4's arbitrary-state successor to [flat]mapGroupsWithState:
    // a StatefulProcessor with named, individually-evolvable state
    // variables over the RocksDB store (the ONLY provider the operator
    // supports — the conf is set for this query and restored). Same
    // contract as the flatMapGroupsWithState test so the two APIs are
    // verified equivalent on this engine: per-user (count, sum) in a
    // ValueState, Update emission, final update == batch aggregate over
    // the doubled source.
    import spark.implicits._
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = Tables.events(spark, sfDir).schema
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val stats = stream.select(col("user_id"), col("value"))
        .as[(Long, Double)]
        .groupByKey(_._1)
        .transformWithState(new UserStatsProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update())
        .toDF("user_id", "n", "total")
      val q = stats.writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("tws_out")
        .groupBy(col("user_id"))
        .agg(max(col("n")).as("n"), max(col("total")).as("total"))
      val want = spark.read.parquet(srcDir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      val joined = got.as("g").join(want.as("b"), Seq("user_id"), "full_outer")
      assert(joined.filter(col("g.n").isNull || col("b.n").isNull ||
        col("g.n") =!= col("b.n") ||
        abs(col("g.total") - col("b.total")) > 1e-6).count() === 0)
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("w4 first-event plans WindowGroupLimit and keeps one row per key") {
    val w4 = graft.streaming.EventsWindows.firstEvents(spark, sfDir)
    assert(graft.plans.PlanChecks.executedPlan(w4).contains("WindowGroupLimit"))
    val dup = w4.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(dup === 0)
    // key coverage: every (user, type) present in the source survives
    assert(w4.count() === Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct().count())
  }

  test("w5 funnel join is equi-keyed (no BNLJ) and respects the interval") {
    val w5 = graft.streaming.EventsWindows.clickToPurchase(spark, sfDir)
    assert(!graft.plans.PlanChecks.hasBroadcastNestedLoop(w5))
    val bad = w5.filter(col("purchase_ts") < col("click_ts") ||
      col("purchase_ts") >= col("click_ts") + expr("INTERVAL 10 MINUTES"))
    assert(bad.count() === 0)
  }

  test("w6 append-mode sink: closed windows only, equal to batch w6") {
    // The PRODUCTION shape of the w6 decomposition: the incremental half
    // (windowed counts) runs in APPEND mode — a window's counts emit
    // exactly once, when the watermark passes its end — and the rank-k
    // filter runs over the closed-window emissions (not a complete-mode
    // re-materialization). Two-chunk feed: all real events, then a
    // far-future sentinel whose only job is to advance the watermark
    // past every real window so they all close; the sentinel's own
    // window stays open and must NOT be emitted.
    val ev = Tables.events(spark, sfDir)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "w6append").toString
    ev.write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(ev.schema).parquet(d)
    val counts = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("w6_append_out").start()
    try {
      q.processAllAvailable()
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      // one day past the last event, 5 min into its hour: every real
      // window ends ≥ 50 min before the advanced watermark
      val sentinelMs = (maxTs.getTime / 3600000L + 24) * 3600000L + 300000L
      ev.limit(1)
        .withColumn("ts", lit(new java.sql.Timestamp(sentinelMs)))
        .withColumn("event_type", lit("zzz_sentinel"))
        .write.mode("append").parquet(d)
      q.processAllAvailable()
    } finally q.stop()

    val emitted = spark.table("w6_append_out")
    // the open sentinel window was not emitted
    assert(emitted.filter(col("event_type") === "zzz_sentinel").count() === 0)
    // rank the closed-window emissions (the batch half of the decomposition)
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w")).orderBy(col("n").desc, col("event_type"))
    val got = emitted
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= 3)
      .select(col("w.start").as("win_start"),
        col("rank").cast("int").as("rank"), col("event_type"), col("n"))
    val want = graft.streaming.EventsWindows.windowTopK(spark, sfDir)
    assert(want.count() > 0)
    val joined = got.as("g").join(want.as("b"),
      Seq("win_start", "rank"), "full_outer")
    assert(joined.filter(col("g.n").isNull || col("b.n").isNull ||
      col("g.n") =!= col("b.n") ||
      col("g.event_type") =!= col("b.event_type")).count() === 0)
  }

  test("event-time timers: streaming gap-fill equals batch q60 up to the final watermark") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "gapfill").toString
      // time-sorted single file: one data batch, no intra-stream late
      // drops — the timer batch after it closes every hour below the
      // final watermark
      Tables.events(spark, sfDir).orderBy("ts").coalesce(1)
        .write.mode("overwrite").parquet(d)
      val stream = spark.readStream
        .schema(Tables.events(spark, sfDir).schema).parquet(d)
      val out = graft.streaming.GapFillStream.gapFillStream(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("gapfill_out").start()
      try { q.processAllAvailable() } finally q.stop()

      val got = spark.table("gapfill_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getBoolean(3)))).toMap
      assert(got.nonEmpty)
      val batch = graft.operators.TemporalJoins.gapFill(spark, sfDir)
        .select(col("user_id"), (unix_timestamp(col("hour")) * 1000)
          .as("hour_ms"), col("value"), col("filled")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getBoolean(3)))).toMap
      // every emitted row is a batch grid row with the same mean + flag
      got.foreach { case (k, (v, f)) =>
        val (bv, bf) = batch.getOrElse(k, fail(s"emitted non-grid row $k"))
        assert(math.abs(v - bv) < 1e-9 && f == bf, s"$k: ($v,$f) vs ($bv,$bf)")
      }
      // completeness: an OBSERVED hour emits once the watermark passes
      // its end; a FILL row emits when its user's NEXT observed hour
      // closes (the catch-up contract) — so each is required exactly
      // under its own closing condition, margin one hour
      val maxTsMs = Tables.events(spark, sfDir)
        .agg(max(unix_timestamp(col("ts")))).head().getLong(0) * 1000
      val wm = maxTsMs - 30 * 60000L
      def closed(h: Long): Boolean = h + 2 * 3600000L <= wm
      val observedByUser = batch.collect {
        case ((u, h), (_, false)) => (u, h)
      }.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val missing = batch.filter { case ((u, h), (_, isFill)) =>
        val required =
          if (!isFill) closed(h)
          else observedByUser(u).find(_ > h).exists(closed)
        required && !got.contains((u, h))
      }
      assert(missing.isEmpty, s"${missing.size} closed rows unemitted")
      // the LOCF path genuinely fired
      assert(got.values.count(_._2) > 0, "no filled rows emitted")
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("gap-fill: multi-batch out-of-order feed drops late rows, never re-emits a closed hour") {
    import spark.implicits._
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "gapfill-ooo").toString
      val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
      val H = 3600000L
      // batch 1: H0 + H1 observed; wm -> H1:20 -> H0 closes (10.0)
      val f1 = Seq((1L, ts(10), 10.0), (1L, ts(70), 20.0), (1L, ts(110), 30.0))
      // batch 2: H3 observed, plus a LATE H0 row (H0:30 < wm H1:20) —
      // must be dropped: H0 already emitted, carry must not regress
      val f2 = Seq((1L, ts(220), 40.0), (1L, ts(30), 99.0))
      // batch 3: H5 pushes wm to H4:30 -> H3 closes, H2 LOCF-fills
      val f3 = Seq((1L, ts(300), 50.0))
      Seq(f1, f2, f3).foreach { rows =>
        rows.toDF("user_id", "ts", "value").coalesce(1)
          .write.mode("append").parquet(d)
        Thread.sleep(1100) // distinct mtimes so maxFilesPerTrigger orders them
      }
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
      val out = graft.streaming.GapFillStream.gapFillStream(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("gapfill_ooo").start()
      try { q.processAllAvailable() } finally q.stop()
      val rows = spark.table("gapfill_ooo").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      // exactly once per (user, hour): the late 99.0 row neither
      // duplicates H0 nor changes its mean
      assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length,
        s"duplicate grid rows: ${rows.mkString(", ")}")
      val byHour = rows.map(t => t._2 -> ((t._3, t._4))).toMap
      assert(byHour === Map(
        t0 + 0 * H -> ((10.0, false)),
        t0 + 1 * H -> ((25.0, false)),   // (20+30)/2, late 99 excluded
        t0 + 2 * H -> ((25.0, true)),    // LOCF fill from H1
        t0 + 3 * H -> ((40.0, false))), s"got $byHour")
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("inactivity alerts: every user's final silence alerts with the true last_seen") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "inactive").toString
      val ev = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
      // one time-sorted data batch: only each user's FINAL silence can
      // alert (intra-batch maxima re-arm before any timer fires), then
      // a far sentinel advances the watermark past every last+gap
      ev.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(d)
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      Thread.sleep(1100)
      ev.limit(1)
        .withColumn("ts",
          lit(new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)))
        .withColumn("user_id", lit(-1L))
        .write.mode("append").parquet(d)
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(d)
      val out = graft.streaming.InactivityStream.inactivityAlerts(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("inactive_out").start()
      try {
        q.processAllAvailable()
        val wantN = ev.select(col("user_id")).distinct().count()
        var tries = 0 // timer emissions can land in the cleanup batch
        while (tries < 40 &&
            spark.table("inactive_out").count() < wantN) {
          Thread.sleep(250); tries += 1
        }
      } finally q.stop()
      val got = spark.table("inactive_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = ev.groupBy(col("user_id"))
        .agg(max(unix_millis(col("ts"))).as("last_ms")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want,
        s"alert mismatch: missing ${want.keySet -- got.keySet}, " +
          s"extra ${got.keySet -- want.keySet}")
      // every alert is armed exactly gap after the last event
      spark.table("inactive_out").collect().foreach { r =>
        assert(r.getLong(2) === r.getLong(1) + 24L * 3600000L)
      }
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("inactivity alerts: planted multi-batch silence fires mid-stream, re-arms delete") {
    import spark.implicits._
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "inactive-planted").toString
      val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      def ts(h: Long) = new java.sql.Timestamp(t0 + h * 3600000L)
      // batch 1: user 1 stops at t0; user 2's same-batch pair must arm
      // ONLY its max (no (2, t0) alert ever). wm after = t0+25.5h.
      val f1 = Seq((1L, ts(0)), (2L, ts(0)), (2L, ts(26)))
      // batch 2: user 1's t0+24h timer is EXPIRED at batch start and
      // user 1 has no rows here -> the (1, t0) alert fires mid-stream;
      // user 2 re-arms (the t0+50h timer is deleted, t0+52h armed)
      val f2 = Seq((2L, ts(28)))
      // batch 3: sentinel advances the watermark past t0+52h
      val f3 = Seq((99L, ts(24 * 30)))
      Seq(f1, f2, f3).foreach { rows =>
        rows.toDF("user_id", "ts").coalesce(1)
          .write.mode("append").parquet(d)
        Thread.sleep(1100) // distinct mtimes: maxFilesPerTrigger orders
      }
      val stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(d)
      val out = graft.streaming.InactivityStream.inactivityAlerts(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("inactive_planted").start()
      try {
        q.processAllAvailable()
        var tries = 0
        while (tries < 40 && spark.table("inactive_planted")
            .filter(col("user_id") < 99L).count() < 2) {
          Thread.sleep(250); tries += 1
        }
      } finally q.stop()
      val got = spark.table("inactive_planted")
        .filter(col("user_id") < 99L).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set(
        (1L, t0),                    // mid-stream silence alert
        (2L, t0 + 28 * 3600000L)),   // final silence; t0/t0+26h deleted
        s"got $got")
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("streaming EWMA equals the batch fold over each user's closed prefix") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "ewma").toString
      Tables.events(spark, sfDir).orderBy("ts").coalesce(1)
        .write.mode("overwrite").parquet(d)
      val stream = spark.readStream
        .schema(Tables.events(spark, sfDir).schema).parquet(d)
      val out = graft.streaming.EwmaStream.ewmaStream(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("ewma_out").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("ewma_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3)))).toMap
      assert(got.nonEmpty)

      // driver reference: per-user hour-sorted hourly means + running fold
      val series = Tables.events(spark, sfDir)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(avg(col("value")).as("v"))
        .filter(col("v").isNotNull)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      val maxTsMs = Tables.events(spark, sfDir)
        .agg(max(unix_timestamp(col("ts")))).head().getLong(0) * 1000
      val wm = maxTsMs - 30 * 60000L
      series.foreach { case (u, hs) =>
        var level = Double.NaN
        hs.zipWithIndex.foreach { case ((_, hourMs, mean), i) =>
          level = if (i == 0) mean else 0.3 * mean + 0.7 * level
          if (hourMs + 3600000L <= wm) {
            val (gm, gl) = got.getOrElse((u, hourMs),
              fail(s"user $u closed hour $hourMs unemitted"))
            assert(math.abs(gm - mean) < 1e-9 && math.abs(gl - level) < 1e-9,
              s"user $u hour $hourMs: ($gm,$gl) vs ($mean,$level)")
          } else assert(!got.contains((u, hourMs)),
            s"user $u hour $hourMs emitted past the watermark")
        }
      }
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("streaming EWMA: a beyond-watermark late row never folds into the level") {
    import spark.implicits._
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "ewma-ooo").toString
      val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
      val H = 3600000L
      val f1 = Seq((1L, ts(10), 10.0), (1L, ts(70), 20.0), (1L, ts(110), 30.0))
      val f2 = Seq((1L, ts(220), 40.0), (1L, ts(30), 99.0)) // late H0 row
      val f3 = Seq((1L, ts(300), 50.0))
      Seq(f1, f2, f3).foreach { rows =>
        rows.toDF("user_id", "ts", "value").coalesce(1)
          .write.mode("append").parquet(d)
        Thread.sleep(1100)
      }
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
      val out = graft.streaming.EwmaStream.ewmaStream(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("ewma_ooo").start()
      try { q.processAllAvailable() } finally q.stop()
      val byHour = spark.table("ewma_ooo").collect()
        .map(r => r.getLong(1) -> ((r.getDouble(2), r.getDouble(3)))).toMap
      assert(byHour === Map(
        t0 + 0 * H -> ((10.0, 10.0)),               // seed, late 99 excluded
        t0 + 1 * H -> ((25.0, 0.3 * 25.0 + 0.7 * 10.0)),
        t0 + 3 * H -> ((40.0, 0.3 * 40.0 + 0.7 * (0.3 * 25.0 + 0.7 * 10.0)))),
        s"got $byHour")
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("streaming anomalies equal batch q62 over the closed prefix") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "anom").toString
      Tables.events(spark, sfDir).orderBy("ts").coalesce(1)
        .write.mode("overwrite").parquet(d)
      val stream = spark.readStream
        .schema(Tables.events(spark, sfDir).schema).parquet(d)
      val out = graft.streaming.AnomalyStream.anomalyStream(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("anom_out").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("anom_out").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3)))).toMap

      val maxTsMs = Tables.events(spark, sfDir)
        .agg(max(unix_timestamp(col("ts")))).head().getLong(0) * 1000
      val wm = maxTsMs - 30 * 60000L
      val batch = graft.operators.TimeSeries.anomalies(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime) ->
          ((r.getDouble(2), r.getDouble(3)))).toMap
      val batchClosed = batch.filter { case ((_, h), _) => h + 3600000L <= wm }
      // same flagged set over the closed prefix, same means and scores
      assert(got.keySet === batchClosed.keySet,
        s"stream ${got.keySet} vs batch ${batchClosed.keySet}")
      assert(got.nonEmpty, "no anomalies closed on this corpus")
      got.foreach { case (k, (v, z)) =>
        val (bv, bz) = batchClosed(k)
        assert(math.abs(v - bv) < 1e-9 && math.abs(z - bz) < 1e-6, s"$k")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("streaming w6 leaderboard equals batch top-k over the closed hours") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "topk").toString
      Tables.events(spark, sfDir).orderBy("ts").coalesce(1)
        .write.mode("overwrite").parquet(d)
      val stream = spark.readStream
        .schema(Tables.events(spark, sfDir).schema).parquet(d)
      val out = graft.streaming.TopKStream.windowTopKStream(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("topk_out").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("topk_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .toSet

      val maxTsMs = Tables.events(spark, sfDir)
        .agg(max(unix_timestamp(col("ts")))).head().getLong(0) * 1000
      val wm = maxTsMs - 30 * 60000L
      val batchClosed = graft.streaming.EventsWindows
        .windowTopK(spark, sfDir).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getString(2),
          r.getLong(3)))
        .filter { case (h, _, _, _) => h + 3600000L <= wm }
        .toSet
      assert(got === batchClosed,
        s"stream-only ${got -- batchClosed}; batch-only ${batchClosed -- got}")
      assert(got.nonEmpty, "no hours closed on this corpus")
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("d20 streaming domain cap: admission capped per source, state carries across batches") {
    import spark.implicits._
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "domaincap").toString
    // file 1: two 'a' docs + one 'b'; file 2 (later): three more 'a',
    // two more 'b'. cap=3 → 'a' admits 2 (batch 1) + 1 (batch 2);
    // 'b' admits all 3.
    val f1 = Seq((1L, "a"), (2L, "a"), (10L, "b")).toDF("doc_id", "source")
    val f2 = Seq((3L, "a"), (4L, "a"), (5L, "a"), (11L, "b"), (12L, "b"))
      .toDF("doc_id", "source")
    f1.coalesce(1).write.mode("append").parquet(d)
    Thread.sleep(1100) // distinct mtimes so maxFilesPerTrigger orders them
    f2.coalesce(1).write.mode("append").parquet(d)
    val stream = spark.readStream.schema(f1.schema)
      .option("maxFilesPerTrigger", "1") // force genuine multi-batch state
      .parquet(d)
    val out = graft.operators.CorpusOps.domainCapStream(stream, cap = 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("domaincap_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("domaincap_out").collect()
    val bySrc = got.groupBy(_.getString(1))
    assert(bySrc("a").length === 3 && bySrc("b").length === 3, got.toSeq)
    // ranks dense 1..k per source
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(_.getInt(2)).sorted.sameElements(1 to rows.length),
        s"$src ranks: ${rows.map(_.getInt(2)).toSeq}")
    }
    // cross-batch carry: batch 1's 'a' docs (1,2) were both admitted
    // before any batch-2 doc could take a slot
    val aIds = bySrc("a").map(_.getLong(0)).toSet
    assert(aIds.contains(1L) && aIds.contains(2L), s"a admitted: $aIds")
    assert(bySrc("b").map(_.getLong(0)).toSet === Set(10L, 11L, 12L))
  }

  test("streaming funnel equals batch q64's chain over the closed prefix") {
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "funnel").toString
      Tables.events(spark, sfDir).orderBy("ts").coalesce(1)
        .write.mode("overwrite").parquet(d)
      val stream = spark.readStream
        .schema(Tables.events(spark, sfDir).schema).parquet(d)
      val out = graft.streaming.FunnelStream.funnelStream(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("funnel_out").start()
      try { q.processAllAvailable() } finally q.stop()
      val got = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getInt(1)) ->
          ((r.getString(2), r.getLong(3)))).toMap
      assert(got.nonEmpty)

      // driver reference: the conditional-min chain over events CLOSED
      // by the final watermark (ts below max event time − 30 min)
      val maxTsMs = Tables.events(spark, sfDir)
        .agg(max(unix_millis(col("ts")))).head().getLong(0)
      val wm = maxTsMs - 30 * 60000L
      val closed = Tables.events(spark, sfDir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isin("view", "click", "purchase"))
        .filter(unix_millis(col("ts")) < wm)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val want = closed.groupBy(_._1).flatMap { case (u, es) =>
        val vOpt = es.filter(_._2 == "view").map(_._3)
          .minOption
        val cOpt = vOpt.flatMap(v =>
          es.filter(e => e._2 == "click" && e._3 >= v).map(_._3).minOption)
        val pOpt = cOpt.flatMap(c =>
          es.filter(e => e._2 == "purchase" && e._3 >= c).map(_._3).minOption)
        vOpt.map(v => (u, 1) -> (("view", v))).toSeq ++
          cOpt.map(c => (u, 2) -> (("click", c))).toSeq ++
          pOpt.map(p => (u, 3) -> (("purchase", p))).toSeq
      }
      assert(got === want)
      // the funnel narrows: per-user step sets are prefixes of 1..3
      got.keys.groupBy(_._1).foreach { case (u, ks) =>
        val steps = ks.map(_._2).toSeq.sorted
        assert(steps === (1 to steps.length), s"user $u steps $steps")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }

  test("streaming funnel: late rows drop, completed users ignore further input") {
    import spark.implicits._
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Paths.get("target", "test-tmp")
      Files.createDirectories(base)
      val d = Files.createTempDirectory(base, "funnel-ooo").toString
      val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
      def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
      def us(min: Long) = (t0 + min * 60000L) * 1000L
      // f1: view@10, click@40 for u1; u2's view@100 pushes wm to 70
      val f1 = Seq((1L, ts(10), "view"), (1L, ts(40), "click"),
        (2L, ts(100), "view"))
      // f2: purchase@60 is LATE (wm 70) → dropped; purchase@80 counts;
      // u2@200 pushes wm to 170 so the purchase closes
      val f2 = Seq((1L, ts(60), "purchase"), (1L, ts(80), "purchase"),
        (2L, ts(200), "click"))
      // f3: u1 converted — further events must be ignored
      val f3 = Seq((1L, ts(90), "purchase"), (1L, ts(95), "view"),
        (2L, ts(300), "purchase"))
      Seq(f1, f2, f3).foreach { rows =>
        rows.toDF("user_id", "ts", "event_type").coalesce(1)
          .write.mode("append").parquet(d)
        Thread.sleep(1100)
      }
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
      val out = graft.streaming.FunnelStream.funnelStream(stream)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("funnel_ooo").start()
      try { q.processAllAvailable() } finally q.stop()
      val u1 = spark.table("funnel_ooo").collect()
        .filter(_.getLong(0) == 1L)
        .map(r => r.getInt(1) -> r.getLong(3)).toMap
      // late purchase@60 excluded; the chain closes on purchase@80;
      // the f3 purchase@90 / view@95 never re-emit or rewrite
      assert(u1 === Map(1 -> us(10), 2 -> us(40), 3 -> us(80)), s"got $u1")
      val u2 = spark.table("funnel_ooo").collect()
        .filter(_.getLong(0) == 2L)
        .map(r => r.getInt(1) -> r.getLong(3)).toMap
      // u2: view@100 closed by wm 170 after f2; click@200 and the
      // final purchase@300 sit above the last watermark (270) → only
      // step 1 is final... except click@200 closes when f3's
      // purchase@300 advances wm to 270. purchase@300 itself never
      // closes.
      assert(u2 === Map(1 -> us(100), 2 -> us(200)), s"got $u2")
    } finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None    => spark.conf.unset(provider)
    }
  }
}

/** Top-level (not an inner/anonymous class: a processor ships to
  * executors, and an inner class would drag the non-serializable
  * scalatest engine along): per-user running (count, sum) in a named
  * ValueState — the state API v2 twin of the flatMapGroupsWithState
  * test's logic.
  */
class UserStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double), (Long, Long, Double)] {
  import org.apache.spark.sql.Encoders
  @transient private var st:
    org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _
  override def init(
      out: org.apache.spark.sql.streaming.OutputMode,
      tm: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[(Long, Double)]("stats",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(uid: Long,
      rows: Iterator[(Long, Double)],
      tv: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Double)] = {
    val (c0, s0) = if (st.exists()) st.get() else (0L, 0.0)
    var c = c0; var s = s0
    rows.foreach { r => c += 1; s += r._2 }
    st.update((c, s))
    Iterator((uid, c, s))
  }
}
