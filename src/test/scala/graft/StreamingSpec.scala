package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsWindows

/** Drives the event-time operators through GENUINE Structured Streaming
  * (readStream → watermark → window agg → memory sink) and asserts the
  * result equals the batch formulation the oracle checks — the
  * batch/stream unification contract.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private lazy val srcDir: String = {
    // Re-materialize events (micros ts) as a stream source dir.
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "stream").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(d)
    d
  }

  test("streaming tumbling-window agg equals the batch result") {
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("tumbling_out")
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
    val want = EventsWindows.tumbling(spark, sfDir)
    // exact on keys/counts; FP tolerance on the sum (accumulation order
    // differs between batch and incremental execution)
    val joined = got.as("g").join(want.as("b"),
      Seq("win_start", "event_type"), "full_outer")
    assert(joined.filter(col("g.n").isNull || col("b.n").isNull ||
      col("g.n") =!= col("b.n") ||
      abs(col("g.total") - col("b.total")) > 1e-6).count() === 0)
    assert(got.count() > 0)
  }

  test("streaming windowed HLL uniques track exact batch w8 within error") {
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val agg = EventsWindows.windowUniquesStream(stream)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("w8_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("w8_out").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val want = EventsWindows.windowUniques(spark, sfDir).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // append mode emits only watermark-closed windows: every emitted
    // window must exist in batch, and only windows ending inside the
    // trailing watermark hour (at most the last two hourly windows)
    // may remain open
    assert(got.keySet.subsetOf(want.keySet))
    assert(got.size >= want.size - 2, s"${got.size} of ${want.size} windows")
    // HLL at rsd 0.02: gate generously at 10% relative error per window
    got.foreach { case (w, approx) =>
      val exact = want(w)
      assert(math.abs(approx - exact) <= math.max(1.0, 0.10 * exact),
        s"window $w: approx $approx vs exact $exact")
    }
  }

  test("streaming session windows equal batch w3 row-for-row") {
    // session_window keeps per-key OPEN-SESSION state (merged as events
    // arrive, emitted when the watermark passes the gap) — the one
    // windowed shape whose extent is data-dependent rather than fixed;
    // parity with batch w3 proves the merge logic, not just the clock
    // math. Complete mode so late-data emission timing can't hide rows.
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("sessions_out")
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    val want = EventsWindows.sessions(spark, sfDir)
    val joined = got.as("g").join(want.as("b"),
      Seq("user_id", "session_start"), "full_outer")
    assert(joined.filter(col("g.n_events").isNull || col("b.n_events").isNull ||
      col("g.n_events") =!= col("b.n_events") ||
      col("g.session_end") =!= col("b.session_end")).count() === 0)
    assert(got.count() > 0)
  }

  test("stream-stream interval join with watermarks equals the batch join") {
    // clicks ⋈ purchases per user within [0, 30 min) after the click —
    // both sides watermarked so state for out-of-range rows is dropped;
    // the batch formulation of the identical condition is the truth.
    val schema = Tables.events(spark, sfDir).schema
    def side(tpe: String, tsName: String) = spark.readStream
      .schema(schema).parquet(srcDir)
      .filter(col("event_type") === tpe)
      .select(col("user_id").as(s"${tsName}_user"),
        col("event_id").as(s"${tsName}_id"), col("ts").as(tsName))
      .withWatermark(tsName, "1 hour")
    val joined = side("click", "click_ts").join(side("purchase", "purchase_ts"),
      col("click_ts_user") === col("purchase_ts_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_ts_id"), col("purchase_ts_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val ev = Tables.events(spark, sfDir)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"), col("ts").as("pts"))
    val want = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") < col("cts") + expr("INTERVAL 30 MINUTES"))
      .select(col("cid"), col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = spark.table("ssjoin_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("watermarked LEFT OUTER stream-stream join equals batch w7 relation") {
    // The null-extended (abandoned-click) rows of a stream-stream LEFT
    // OUTER join may only emit once the watermark PROVES no purchase
    // can still arrive — with a static file source the watermark parks
    // at max(event time) − delay, stranding later clicks' verdicts in
    // state. The spec drives that mechanism explicitly: a sentinel
    // batch two days ahead (reserved negative ids, excluded from the
    // compare) advances BOTH sides' watermarks so every real
    // abandonment flushes.
    val ev = Tables.events(spark, sfDir)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "w7stream").toString
    ev.write.mode("overwrite").parquet(d)

    // batch truth first (drives the bounded emission wait below): ALL
    // left-join pairs — the registered w7 adds rank-1 attribution on
    // top; the join relation itself is what streaming must reproduce
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"),
        col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"),
        col("ts").as("pts"))
    val want = c.join(p, col("cu") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") < col("cts") + expr("INTERVAL 10 MINUTES"), "left")
      .select(col("cid"), col("pid"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(want.exists(_._2 == -1L), "fixture has no abandoned clicks")

    val schema = ev.schema
    def side(tpe: String, tsName: String) = spark.readStream
      .schema(schema).parquet(d)
      .filter(col("event_type") === tpe)
      .select(col("user_id").as(s"${tsName}_user"),
        col("event_id").as(s"${tsName}_id"), col("ts").as(tsName))
      .withWatermark(tsName, "10 minutes")
    val joined = side("click", "click_ts")
      .join(side("purchase", "purchase_ts"),
        col("click_ts_user") === col("purchase_ts_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") < col("click_ts") + expr("INTERVAL 10 MINUTES"),
        "leftOuter")
      .select(col("click_ts_id").as("click_id"),
        col("purchase_ts_id").as("purchase_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("w7_out").start()
    def gotSet() = spark.table("w7_out")
      .filter(col("click_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    try {
      q.processAllAvailable()
      // sentinel batch: one click + one purchase of a reserved user two
      // days out — passes both sides' type filters (each watermark node
      // only sees post-filter rows), joins nothing real
      val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 2L * 24 * 3600 * 1000)
      import spark.implicits._
      Seq((-1L, far, -1L, "click", 0.0, "{}"),
          (-2L, far, -1L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(d)
      q.processAllAvailable()
      // null-extended rows can land in the no-data state-cleanup batch
      // after processAllAvailable returns — bounded wait, not a sleep
      var tries = 0
      while (tries < 40 && gotSet() != want) { Thread.sleep(250); tries += 1 }
    } finally q.stop()
    assert(gotSet() === want)
  }

  test("streaming count-min sketch equals the batch sketch cell-for-cell") {
    // Cell values are order-independent sums, so the streaming sketch
    // is EXACTLY the batch sketch — the same transformation applied to
    // a readStream relation, with state bounded at depth × width.
    val docs = Tables.documents(spark, sfDir)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "cmstream").toString
    docs.write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(docs.schema).parquet(d)
    val out = graft.operators.TextAnalysis.countMinStream(stream)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("cm_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("cm_out")
    assert(got.count() > 0 && got.count() <= 4 * 512)
    val want = graft.operators.TextAnalysis.countMinStream(docs)
    val j = got.as("g").join(want.as("b"), Seq("r", "cell"), "full_outer")
    assert(j.filter(col("g.cn").isNull || col("b.cn").isNull ||
      col("g.cn") =!= col("b.cn")).count() === 0)
  }

  test("streaming decontamination equals batch d11 row-for-row") {
    // Static broadcast of the benchmark shingle set against a readStream
    // corpus — the continuous-ingest form of d11_decontaminate.
    val docs = Tables.documents(spark, sfDir)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "docstream").toString
    docs.write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(docs.schema).parquet(d)
    val bench = graft.operators.CorpusOps.benchShingles(spark, sfDir)
    val out = graft.operators.CorpusOps.decontaminateStream(stream, bench)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("decon_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("decon_out")
    val want = graft.operators.CorpusOps.decontaminate(spark, sfDir)
    val joined = got.as("g").join(want.as("b"), Seq("doc_id"), "full_outer")
    assert(joined.filter(
      col("g.n_shared").isNull || col("b.n_shared").isNull ||
      col("g.n_shared") =!= col("b.n_shared") ||
      col("g.n_shingles") =!= col("b.n_shingles") ||
      abs(col("g.contamination") - col("b.contamination")) > 1e-12)
      .count() === 0)
    assert(got.count() > 0)
    spark.catalog.clearCache() // batch d11 caches its shingle table
  }

  test("streaming point-in-time SCD-2 enrichment equals the batch kernel row-for-row") {
    // q90's kernel on a live feed: stream-static LEFT join of events
    // into the SCD-2 validity intervals. Half the events are shifted
    // +8 months so the stream crosses all three regimes (v1, v2,
    // churned-NULL) — parity must hold on every one.
    val probes = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        org.apache.spark.sql.functions.to_date(col("ts")).as("event_date"))
      .withColumn("event_date",
        when(pmod(col("event_id"), lit(2)) === 0,
          org.apache.spark.sql.functions.add_months(col("event_date"), 8))
          .otherwise(col("event_date")))
    val hist = graft.operators.RelationalQueries3.scd2History(spark, sfDir)
      .cache()
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "pitstream").toString
    probes.repartition(2).write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(probes.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val out = graft.operators.RelationalQueries3
      .enrichPointInTime(stream, hist)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("pit_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("pit_out")
    val want = graft.operators.RelationalQueries3
      .enrichPointInTime(probes, hist)
    assert(got.count() === want.count())
    assert(got.count() > 0)
    // row-for-row on the (event_id) key: every column equal, including
    // the null-extended churn rows
    val joined = got.as("g").join(want.as("b"), Seq("event_id"), "full_outer")
    assert(joined.filter(
      col("g.user_id").isNull || col("b.user_id").isNull ||
      col("g.event_date") =!= col("b.event_date") ||
      !(col("g.mktsegment") <=> col("b.mktsegment")) ||
      !(col("g.acctbal") <=> col("b.acctbal")) ||
      !(col("g.dim_version") <=> col("b.dim_version")))
      .count() === 0)
    spark.catalog.clearCache()
  }

  test("streaming CDC novelty equals batch d35 row-for-row") {
    // d35's ingest gate as a stream: the incoming slice chunked
    // in-stream, membership-joined against the PERSISTED chunk store
    // (load-or-build, same path the registered batch query uses), and
    // compared row-for-row — both run Dedup.chunkNoveltyAgainst
    // verbatim, so every column including the known_frac double must
    // be exactly equal on the closed prefix.
    val docs = Tables.documents(spark, sfDir)
    val store = graft.operators.IndexStore.chunkStoreFor(spark, sfDir)
    val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "chunknovelty").toString
    // two source files + maxFilesPerTrigger=1: the per-doc aggregate
    // state must hold across micro-batches
    incoming.repartition(2).write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val out = graft.operators.Dedup.chunkNoveltyStream(stream, store)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("chunknovelty_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("chunknovelty_out")
    val want = graft.operators.IndexStore.persistedChunkNovelty(spark, sfDir)
    assert(got.count() > 0)
    val joined = got.as("g").join(want.as("b"), Seq("doc_id"), "full_outer")
    assert(joined.filter(
      col("g.n_chunks").isNull || col("b.n_chunks").isNull ||
      col("g.n_chunks") =!= col("b.n_chunks") ||
      col("g.n_known") =!= col("b.n_known") ||
      col("g.n_bytes") =!= col("b.n_bytes") ||
      col("g.n_known_bytes") =!= col("b.n_known_bytes") ||
      col("g.known_frac") =!= col("b.known_frac"))
      .count() === 0)
  }

  test("streaming URL novelty gate equals the batch join row-for-row") {
    // d37's ingest gate as a stream: incoming docs canonicalize
    // in-stream (stateless projection) and probe a STATIC keeper
    // table built from the already-crawled slice — both paths run
    // Dedup.urlNoveltyStream verbatim, so every row must be equal.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    // the incoming batch: one never-crawled domain (src3, whose URL
    // groups live entirely inside the batch → novel) plus re-crawls
    // of known domains (doc_id % 8, whose group-mates are already
    // kept → known); mod 4 would NOT work — 4 divides the 100-doc
    // path cycle, so a mod-4 slice contains whole canonical groups
    val isIncoming = col("source") === "src3" ||
      pmod(col("doc_id"), lit(8)) === 0
    val existing = docs.filter(!isIncoming)
    val keepers = graft.operators.Dedup.withCanonicalUrl(existing)
      .groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("keeper_id"))
    val incoming = docs.filter(isIncoming)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "urlnovelty").toString
    incoming.repartition(2).write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val out = graft.operators.Dedup.urlNoveltyStream(stream, keepers)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("urlnovelty_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("urlnovelty_out")
    val want = graft.operators.Dedup.urlNoveltyStream(incoming, keepers)
    assert(got.count() > 0)
    val joined = got.as("g").join(want.as("b"), Seq("doc_id"), "full_outer")
    assert(joined.filter(
      col("g.canonical_url").isNull || col("b.canonical_url").isNull ||
      col("g.canonical_url") =!= col("b.canonical_url") ||
      col("g.known") =!= col("b.known"))
      .count() === 0)
    // the gate actually differentiates: both verdicts occur
    assert(got.filter(col("known")).count() > 0)
    assert(got.filter(!col("known")).count() > 0)
  }

  test("streaming exact dedup keeps exactly batch d1's fingerprint set") {
    import graft.functions.TextFunctions.fingerprint
    val docs = Tables.documents(spark, sfDir)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "dedupstream").toString
    docs.write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(docs.schema).parquet(d)
    val out = graft.operators.Dedup.exactDedupStream(stream)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("dedup_out")
    val want = graft.operators.Dedup.exactDedup(spark, sfDir)
    // one keeper per fingerprint, same fingerprint set as batch d1
    assert(got.count() === want.count())
    assert(got.select("fp").distinct().count() === got.count())
    assert(got.as("g").join(want.as("b"), Seq("fp"), "full_outer")
      .filter(col("g.doc_id").isNull || col("b.keep_doc_id").isNull)
      .count() === 0)
    // every kept (doc_id, fp) is a genuine member of that content group
    // (first-SEEN keeper — arrival order, not batch's min-doc_id)
    val members = docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
    assert(got.join(members, Seq("doc_id", "fp")).count() === got.count())
  }

  test("streaming cross-corpus dedup keeps exactly batch d23's fingerprint set") {
    import graft.functions.TextFunctions.fingerprint
    val docs = Tables.documents(spark, sfDir)
    val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val existing = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "crossdedup").toString
    // two source files + maxFilesPerTrigger=1: the dedup state and the
    // stream-static anti join must both hold across micro-batches
    incoming.repartition(2).write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val out = graft.operators.Dedup.crossDedupStream(stream, existing)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("crossdedup_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("crossdedup_out")
    val want = graft.operators.Dedup.crossDedup(spark, sfDir)
    // one keeper per fingerprint, same fingerprint set as batch d23
    assert(got.count() === want.count())
    assert(got.select("fp").distinct().count() === got.count())
    assert(got.as("g").join(want.as("b"), Seq("fp"), "full_outer")
      .filter(col("g.doc_id").isNull || col("b.doc_id").isNull)
      .count() === 0)
    // nothing already in the existing corpus survives
    assert(got.join(existing, Seq("fp"), "left_semi").count() === 0)
    // every kept (doc_id, fp) is a genuine INCOMING member (first-SEEN
    // keeper — arrival order, not batch's min-doc_id)
    val members = incoming
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
    assert(got.join(members, Seq("doc_id", "fp")).count() === got.count())
  }

  test("streaming ingest against the PERSISTED fingerprint index (d28 topology)") {
    // the full production wiring: the static side of the stream-static
    // anti join is the parquet+manifest fingerprint index on disk, not
    // an in-session relation — load, stream, compare to batch d23
    import graft.functions.TextFunctions.fingerprint
    val docs = Tables.documents(spark, sfDir)
    val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val idx = Files.createTempDirectory(base, "fpidx_stream").toString
    graft.operators.IndexStore.saveFingerprints(
      docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        .select(col("doc_id"), fingerprint(col("text")).as("fp")),
      idx, Map("mod" -> "3"))
    val d = Files.createTempDirectory(base, "fpidx_in").toString
    incoming.repartition(2).write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
    val out = graft.operators.Dedup.crossDedupStream(stream,
      graft.operators.IndexStore.loadFingerprints(spark, idx))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fpidx_out").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("fpidx_out")
    val want = graft.operators.Dedup.crossDedup(spark, sfDir)
    assert(got.count() === want.count())
    assert(got.as("g").join(want.as("b"), Seq("fp"), "full_outer")
      .filter(col("g.doc_id").isNull || col("b.doc_id").isNull)
      .count() === 0)
  }

  test("streaming windowed top-k equals batch w6") {
    // The incremental half (watermarked windowed counts) runs as a
    // genuine stream; the rank-k filter is applied over the closed
    // windows in the sink — the standard streaming decomposition of a
    // non-incremental ranking.
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val counts = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("wtopk_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w")).orderBy(col("n").desc, col("event_type"))
    val got = spark.table("wtopk_out")
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= 3)
      .select(col("w.start").as("win_start"), col("rank").cast("int").as("rank"),
        col("event_type"), col("n"))
    val want = EventsWindows.windowTopK(spark, sfDir)
    val joined = got.as("g").join(want.as("b"),
      Seq("win_start", "rank"), "full_outer")
    assert(want.count() > 0)
    assert(joined.filter(col("g.n").isNull || col("b.n").isNull ||
      col("g.n") =!= col("b.n") ||
      col("g.event_type") =!= col("b.event_type")).count() === 0)
  }

  test("streaming ANN: live query feed vs static IVF index equals batch s3") {
    // The vector-lookup-service shape: queries arrive as a stream and
    // probe the STATIC checkpointed IVF index (stream-static equi-join
    // on the cell id). Rank windows are unsupported on streams, so the
    // top-k is a per-query bounded aggregate over the candidates —
    // collect, sort by (cos desc, id), slice k — in complete mode
    // (spec-sized; a production deployment would swap in a bounded
    // top-k Aggregator to cap per-query state at k instead of the
    // candidate count). Must equal batch s3 row-for-row: same index,
    // same probes, same tie-break.
    import graft.operators.Similarity
    val k = 5
    Similarity.invalidateIvfIndexes()
    val idx = Similarity.ivfIndexFor(spark, sfDir)
    val queries = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "annstream").toString
    queries.write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(queries.schema).parquet(d)
    val topk = Similarity.ivfCandidates(idx, stream)
      .groupBy(col("query_id"))
      .agg(expr(s"slice(array_sort(collect_list(" +
        s"struct(-cos AS nc, neighbor_id AS id, cos AS c))), 1, $k)").as("top"))
    val q = topk.writeStream.outputMode("complete")
      .format("memory").queryName("sann_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("sann_out")
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"), col("col.c").as("cos"))
    val want = Similarity.ivfTopK(spark, sfDir)
    assert(want.count() > 0)
    val joined = got.as("g").join(want.as("b"),
      Seq("query_id", "rank"), "full_outer")
    assert(joined.filter(col("g.neighbor_id").isNull ||
      col("b.neighbor_id").isNull ||
      col("g.neighbor_id") =!= col("b.neighbor_id") ||
      abs(col("g.cos") - col("b.cos")) > 1e-12).count() === 0)
  }

  test("streaming minhash candidates equal batch d3 pairs") {
    // A live doc feed banded per-row (stateless HOF signature) and
    // joined against the static MinHash index must find exactly the
    // pairs the batch band self-join finds: streaming the corpus
    // against its own index yields each unordered batch pair in both
    // directions, nothing more, with identical exact-Jaccard values.
    val docs = Tables.documents(spark, sfDir)
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "minhashstream").toString
    docs.write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(docs.schema).parquet(d)
    val index = graft.operators.Dedup.minhashIndex(spark, sfDir)
    val out = graft.operators.Dedup.minhashCandidatesStream(stream, index)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("minhash_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("minhash_out")
      .select(least(col("doc_id"), col("corpus_doc_id")).as("doc_a"),
        greatest(col("doc_id"), col("corpus_doc_id")).as("doc_b"),
        col("jaccard"))
      .distinct()
    val want = graft.operators.Dedup.minhashLshPairs(spark, sfDir)
    assert(want.count() > 0)
    val joined = got.as("g").join(want.as("b"), Seq("doc_a", "doc_b"), "full_outer")
    // same pair set, bit-identical jaccard (same arithmetic both sides)
    assert(joined.filter(col("g.jaccard").isNull || col("b.jaccard").isNull ||
      col("g.jaccard") =!= col("b.jaccard")).count() === 0)
    spark.catalog.clearCache() // batch side caches its shingle table
  }

  test("watermarked streaming minhash candidates equal batch d3 pairs") {
    // Same parity contract as above, through the WATERMARKED state path
    // (dropDuplicatesWithinWatermark on the candidate keys): with all
    // docs inside one micro-batch nothing ages out, so the result must
    // still equal batch d3 exactly — what changes is that the candidate
    // collapse state is now bounded by the watermark instead of
    // unbounded (the production continuous-ingest configuration).
    val docs = Tables.documents(spark, sfDir)
      .withColumn("ts",
        timestamp_seconds(lit(1704067200L) + col("doc_id")))
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val d = Files.createTempDirectory(base, "minhashwm").toString
    docs.write.mode("overwrite").parquet(d)
    val stream = spark.readStream.schema(docs.schema).parquet(d)
    val index = graft.operators.Dedup.minhashIndex(spark, sfDir)
    val out = graft.operators.Dedup.minhashCandidatesStream(stream, index,
      watermark = Some(("ts", "10 minutes")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("minhash_wm_out").start()
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.table("minhash_wm_out")
      .select(least(col("doc_id"), col("corpus_doc_id")).as("doc_a"),
        greatest(col("doc_id"), col("corpus_doc_id")).as("doc_b"),
        col("jaccard"))
      .distinct()
    val want = graft.operators.Dedup.minhashLshPairs(spark, sfDir)
    assert(want.count() > 0)
    val joined = got.as("g").join(want.as("b"), Seq("doc_a", "doc_b"), "full_outer")
    assert(joined.filter(col("g.jaccard").isNull || col("b.jaccard").isNull ||
      col("g.jaccard") =!= col("b.jaccard")).count() === 0)
    spark.catalog.clearCache()
  }

  test("stateful mapGroupsWithState per-user counts match batch groupBy") {
    import spark.implicits._
    val schema = Tables.events(spark, sfDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val counted = stream.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) => {
          val c = state.getOption.getOrElse(0L) + rows.size
          state.update(c)
          (uid, c)
        })
      .toDF("user_id", "n")
    val q = counted.writeStream.outputMode("update")
      .format("memory").queryName("state_out").start()
    try { q.processAllAvailable() } finally q.stop()

    // single micro-batch source → last update per user is the total
    val got = spark.table("state_out")
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
    val want = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val joined = got.as("g").join(want.as("b"), Seq("user_id"), "full_outer")
    assert(joined.filter(col("g.n").isNull || col("b.n").isNull ||
      col("g.n") =!= col("b.n")).count() === 0)
  }
}
