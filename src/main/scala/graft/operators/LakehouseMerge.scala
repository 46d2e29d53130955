package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q88 — write-audit-publish MERGE/upsert into a VERSIONED persisted
  * table (r13 verdict #5): the lakehouse maintenance primitive the
  * 100 TB story needs — a base snapshot is published, a delta is
  * merged in, and readers NEVER see a half-written state because a
  * version becomes visible only when its manifest lands, and the
  * manifest lands only after the written files are read back and
  * audited. Builds on q74's mergeability gate (the audit re-derives
  * the new version's mass from the previous manifest + the delta and
  * requires exact conservation) and the IndexStore manifest-last
  * convention, generalized to MULTIPLE immutable versions.
  *
  * Table layout under one directory:
  *   `v=N/`           immutable parquet data files for version N
  *   `manifest_vN/`   1-row parquet (version, n_rows, orders_mass,
  *                    price_mass) — written LAST; its `_SUCCESS`
  *                    marker IS the publish. Manifests are
  *                    append-only: publishing N never touches N−1, so
  *                    a reader holds a consistent snapshot for as
  *                    long as it wants (time travel falls out free).
  *
  * Crash safety (spec-pinned): a crash BEFORE publish leaves
  * `v=N` data files but no `manifest_vN/_SUCCESS` — readers keep
  * serving N−1, and the next writer run overwrites `v=N` and
  * publishes, self-healing. A crash DURING the manifest write leaves
  * a marker-less `manifest_vN` directory — unpublished by definition —
  * which the re-run clears before its own errorifexists publish
  * ([[clearUnpublishedManifest]]), same story.
  *
  * Concurrent writers (r13 verdict #8): publish performs an
  * OPTIMISTIC version check — it re-lists published manifests and
  * fails if the head moved past the version this writer based its
  * merge on, or if the target manifest already exists. This narrows
  * the lost-update window to the manifest write itself; closing it
  * entirely needs the store's conditional-put/rename primitive
  * (HDFS atomic rename, S3 If-None-Match), which is a deployment
  * binding, not plan logic. Single-writer-per-table remains the
  * documented operating mode.
  *
  * Scale posture: the merge is ONE full-outer join of the current
  * version with the delta summary, both keyed on the merge key (at
  * 100 TB both sides are bucketed by o_custkey — zero-Exchange, the
  * q78 layout); the audit reads ONE manifest row plus the new
  * version's own aggregate (group-cardinality-sized, not fact-sized);
  * nothing ever rewrites history. Reference behavior for the family
  * cited at `Sample.cs:1-264` (the reference has no table-maintenance
  * surface; SURVEY §2.3 absent category).
  *
  * Exactness: counts are bigint; money is decimal(18,2)-cast (exact
  * for the 2 dp generator values) summed as exact decimal and merged
  * by exact decimal addition — the merged totals are bit-identical to
  * the oracle's full recompute; the one double appears at the final
  * output cast. `last_orderdate` is a max of dates. The merged total
  * is re-normalized to decimal(28,2) (sum type of the slices) —
  * exact below 1e26 cents, i.e. always.
  */
object LakehouseMerge {

  private def tablePath(s: SparkSession, dir: String, mod: Int): String = {
    val tag = s"${dir.replaceAll("[^A-Za-z0-9.]", "_")}_m${mod}_" +
      IndexStore.corpusTag(s, dir, "orders.parquet")
    s"target/graft_table/orders_summary/$tag"
  }

  private def fs(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Highest version with a complete (SUCCESS-marked) manifest; 0 if
    * none. Probed through the Hadoop FS API (HDFS/S3 paths work). */
  private[graft] def publishedVersion(s: SparkSession, path: String): Int = {
    val f = fs(s, path)
    val base = new org.apache.hadoop.fs.Path(path)
    if (!f.exists(base)) 0
    else f.listStatus(base).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("manifest_v") =>
        n.stripPrefix("manifest_v").toInt }
      .filter(v => f.exists(
        new org.apache.hadoop.fs.Path(s"$path/manifest_v$v/_SUCCESS")))
      .sorted.lastOption.getOrElse(0)
  }

  /** Clear an UNPUBLISHED manifest directory (exists but has no
    * `_SUCCESS`) so the subsequent `errorifexists` write can land.
    * A manifest without its marker is by definition the debris of a
    * writer that crashed MID-manifest-write — `publishedVersion`
    * never resolves it, so deleting it changes nothing a reader can
    * see, and leaving it would turn the self-healing re-run into a
    * path-already-exists failure. A manifest WITH `_SUCCESS` is left
    * alone — the errorifexists write then throws, which is exactly
    * the optimistic-concurrency guard (another writer published
    * first). Shared by this store and [[CowErasure]]'s. */
  private[operators] def clearUnpublishedManifest(s: SparkSession,
      manifestDir: String): Unit = {
    val f = fs(s, manifestDir)
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    if (f.exists(p) &&
        !f.exists(new org.apache.hadoop.fs.Path(s"$manifestDir/_SUCCESS"))) {
      f.delete(p, true)
      ()
    }
  }

  /** Write version files WITHOUT publishing — the crash-window state
    * the spec drives directly. Overwrite: re-running a failed writer
    * self-heals. */
  private[graft] def writeVersion(df: DataFrame, path: String,
      v: Int): Unit =
    df.write.mode("overwrite").parquet(s"$path/v=$v")

  private[graft] def readVersion(s: SparkSession, path: String,
      v: Int): DataFrame =
    s.read.parquet(s"$path/v=$v")

  /** Drop the persisted table for `dir` entirely (bench cold-path
    * probe; Hadoop FS so cluster paths work). */
  def invalidateOrdersSummary(s: SparkSession, dir: String,
      mod: Int = 3): Unit = {
    val path = tablePath(s, dir, mod)
    fs(s, path).delete(new org.apache.hadoop.fs.Path(path), true)
    ()
  }

  /** The published view of the table: resolves the manifest head,
    * then reads that version's files. */
  def readTable(s: SparkSession, path: String): DataFrame = {
    val v = publishedVersion(s, path)
    require(v > 0, s"no published version at $path")
    readVersion(s, path, v)
  }

  /** AUDIT then PUBLISH version `v`: read the just-written files BACK
    * from storage, compare (rows, orders_mass, price_mass) against
    * the caller's expectation, optimistically re-check the version
    * head, and only then write `manifest_vN` (the publish). A failed
    * audit throws with both sides — the unpublished `v=N` files are
    * inert. */
  private[graft] def auditAndPublish(s: SparkSession, path: String, v: Int,
      expRows: Long, expOrders: Long, expPrice: java.math.BigDecimal): Unit = {
    val back = readVersion(s, path, v)
      .agg(count(lit(1)).as("n_rows"), sum(col("n_orders")).as("om"),
        sum(col("total_dec")).as("pm")).head()
    val (gotRows, gotOrders) = (back.getLong(0), back.getLong(1))
    val gotPrice = back.getDecimal(2)
    require(gotRows == expRows && gotOrders == expOrders &&
      gotPrice.compareTo(expPrice) == 0,
      s"audit failed for v$v at $path: read back ($gotRows rows, " +
        s"$gotOrders orders, $gotPrice) expected ($expRows, $expOrders, " +
        s"$expPrice) — NOT publishing")
    // optimistic concurrency check (r13 verdict #8): fail rather than
    // publish over a version another writer landed first
    val head = publishedVersion(s, path)
    require(head == v - 1,
      s"publish conflict at $path: head is v$head, this writer merged " +
        s"from v${v - 1} — rebase required")
    import s.implicits._
    clearUnpublishedManifest(s, s"$path/manifest_v$v")
    Seq((v, gotRows, gotOrders, gotPrice.toPlainString))
      .toDF("version", "n_rows", "orders_mass", "price_mass")
      .coalesce(1).write.mode("errorifexists").parquet(s"$path/manifest_v$v")
  }

  private def readManifestRow(s: SparkSession, path: String,
      v: Int): (Long, Long, java.math.BigDecimal) = {
    val r = s.read.parquet(s"$path/manifest_v$v").head()
    (r.getLong(1), r.getLong(2), new java.math.BigDecimal(r.getString(3)))
  }

  private def summarize(o: DataFrame): DataFrame =
    o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("total_dec"),
        max(col("o_orderdate").cast("date")).as("last_orderdate"))

  private def massOf(summary: DataFrame):
      (Long, Long, java.math.BigDecimal) = {
    val r = summary.agg(count(lit(1)).as("n"), sum(col("n_orders")),
      sum(col("total_dec")).cast("decimal(38,2)")).head()
    (r.getLong(0), r.getLong(1), r.getDecimal(2))
  }

  /** q88's STREAMING form — continuous lakehouse ingest: every
    * micro-batch of a live orders feed runs the SAME summarize →
    * merge → write → audit → publish cycle against the current
    * manifest head, so the versioned table advances one audited,
    * crash-safe version per non-empty batch and a reader at any
    * moment sees a complete published snapshot (never a half-merged
    * batch). Because the merge is mass-ADDITIVE (exact decimal sums,
    * max dates), the final table is independent of how the feed was
    * batched — StreamingSpec asserts equality with the one-shot batch
    * recompute over the whole feed, and that each intermediate
    * version was published in sequence.
    *
    * foreachBatch is the right sink: the merge needs the previous
    * VERSION (a table read), the conservation audit, and a
    * manifest publish — per-batch actions outside what a streaming
    * aggregate state can express. Restart semantics: a batch
    * replayed after a crash re-runs its merge against the head it
    * finds; the optimistic head check makes the publish safe, and a
    * batch that fully published before the crash re-merges as a
    * no-op only if the caller's feed is exactly-once — otherwise use
    * the checkpointed batchId to skip (documented, not defaulted:
    * dedup-on-replay is a feed contract, not plan logic).
    */
  def upsertOrdersStream(streamOrders: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    streamOrders.writeStream.foreachBatch {
      (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val delta = summarize(batch
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              col("o_orderdate"))).cache()
          val (_, omD, pmD) = massOf(delta)
          val head = publishedVersion(s, path)
          if (head == 0) {
            writeVersion(delta, path, 1)
            val (r1, om1, pm1) = massOf(delta)
            auditAndPublish(s, path, 1, r1, om1, pm1)
          } else {
            val current = readVersion(s, path, head)
            val merged = current.as("c")
              .join(delta.as("d"), Seq("o_custkey"), "full_outer")
              .select(col("o_custkey"),
                (coalesce(col("c.n_orders"), lit(0L)) +
                  coalesce(col("d.n_orders"), lit(0L))).as("n_orders"),
                (coalesce(col("c.total_dec"), lit(0).cast("decimal(28,2)")) +
                  coalesce(col("d.total_dec"), lit(0).cast("decimal(28,2)")))
                  .cast("decimal(28,2)").as("total_dec"),
                greatest(col("c.last_orderdate"), col("d.last_orderdate"))
                  .as("last_orderdate"))
            writeVersion(merged, path, head + 1)
            val (_, omH, pmH) = readManifestRow(s, path, head)
            val expRows = merged.count()
            auditAndPublish(s, path, head + 1,
              expRows, omH + omD, pmH.add(pmD))
          }
          delta.unpersist()
          ()
        }
    }

  /** The registered q88: publish a v1 base snapshot (orders with
    * o_orderkey % mod != 0 summarized per customer), MERGE the
    * remaining slice in as v2 under write-audit-publish, and return
    * the table AS A READER SEES IT (through the manifest head) —
    * which the oracle checks against a full recompute over ALL
    * orders: conservation end-to-end, through two publishes and a
    * crash-safe merge. Warm runs resolve the manifest head and go
    * straight to the read.
    */
  /** q89 — TIME-TRAVEL version diff: read versions 1 and 2 of the
    * published table CONCURRENTLY (immutable `v=N` directories make
    * this free — publishing v2 never touched v1's files) and emit the
    * per-customer change report: customers INSERTED by the merge and
    * customers UPDATED, with their exact order-count and price deltas.
    * This is the snapshot-diff primitive (d31's shape, on the
    * versioned table store): an incremental downstream consumer reads
    * the delta between two published versions instead of re-scanning
    * the table. Runs the q88 flow first if the table is unpublished
    * (warm runs resolve manifests only).
    *
    * Exactness: deltas are exact bigint/decimal differences of
    * version rows; the oracle recomputes them from the raw slices —
    * conservation must hold through both publishes for the hashes to
    * agree. Deletes cannot occur in this merge (it only adds mass),
    * so every changed row classifies as insert or update.
    *
    * Scale posture: one full-outer join of two versions co-keyed on
    * the merge key (bucketed at 100 TB → zero Exchange, the q78
    * layout); nothing touches the fact table.
    */
  def versionDiff(s: SparkSession, dir: String, mod: Int = 3): DataFrame = {
    upsertOrdersSummary(s, dir, mod) // ensure v1+v2 are published
    val path = tablePath(s, dir, mod)
    val v1 = readVersion(s, path, 1).as("a")
    val v2 = readVersion(s, path, 2).as("b")
    v2.join(v1, Seq("o_custkey"), "left")
      .filter(col("a.n_orders").isNull ||
        col("b.n_orders") =!= col("a.n_orders"))
      .select(col("o_custkey"),
        when(col("a.n_orders").isNull, lit("insert"))
          .otherwise(lit("update")).as("change"),
        (col("b.n_orders") - coalesce(col("a.n_orders"), lit(0L)))
          .as("n_orders_delta"),
        (col("b.total_dec") -
          coalesce(col("a.total_dec"), lit(0).cast("decimal(28,2)")))
          .cast("double").as("price_delta"))
      .orderBy(col("o_custkey"))
  }

  /** q92 — table HISTORY: the audit log of every published version
    * (the DESCRIBE HISTORY primitive of a lakehouse table) read
    * straight from the append-only manifests — version, row count,
    * and the conserved masses, one row per publish. Because manifests
    * are immutable and publish-last, this is a metadata-only scan
    * (head-count manifest files, one row each — never the data), and
    * because each manifest's masses were AUDITED against the previous
    * manifest + delta at publish time, the history doubles as the
    * table's conservation ledger: the oracle recomputes every
    * version's masses from the raw slices and all must agree.
    *
    * Exactness: counts bigint; price mass is the manifest's exact
    * decimal string rendered to double at the output boundary (same
    * nearest-double both engines). Runs the q88 flow first if the
    * table is unpublished.
    */
  def tableHistory(s: SparkSession, dir: String, mod: Int = 3): DataFrame = {
    upsertOrdersSummary(s, dir, mod) // ensure v1+v2 are published
    val path = tablePath(s, dir, mod)
    val head = publishedVersion(s, path)
    (1 to head).map(v => s.read.parquet(s"$path/manifest_v$v"))
      .reduce(_ unionByName _)
      .select(col("version"), col("n_rows"), col("orders_mass"),
        col("price_mass").cast("double").as("price_mass"))
      .orderBy(col("version"))
  }

  def upsertOrdersSummary(s: SparkSession, dir: String,
      mod: Int = 3): DataFrame = {
    val path = tablePath(s, dir, mod)
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
    if (publishedVersion(s, path) < 1) {
      val base = summarize(
        orders.filter(pmod(col("o_orderkey"), lit(mod)) =!= 0))
      val (r, om, pm) = massOf(base)
      writeVersion(base, path, 1)
      auditAndPublish(s, path, 1, r, om, pm)
    }
    if (publishedVersion(s, path) < 2) {
      val delta = summarize(
        orders.filter(pmod(col("o_orderkey"), lit(mod)) === 0))
      val current = readVersion(s, path, 1)
      // MERGE: matched customers add their masses (decimal-exact) and
      // take the later date; unmatched insert as-is. greatest()
      // ignores nulls on the outer join's unmatched sides.
      val merged = current.as("c")
        .join(delta.as("d"), Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("c.n_orders"), lit(0L)) +
            coalesce(col("d.n_orders"), lit(0L))).as("n_orders"),
          (coalesce(col("c.total_dec"), lit(0).cast("decimal(28,2)")) +
            coalesce(col("d.total_dec"), lit(0).cast("decimal(28,2)")))
            .cast("decimal(28,2)").as("total_dec"),
          greatest(col("c.last_orderdate"), col("d.last_orderdate"))
            .as("last_orderdate"))
      writeVersion(merged, path, 2)
      // expected v2 mass = published v1 manifest + computed delta mass:
      // the q74-style conservation gate, derived WITHOUT re-reading v1
      val (_, om1, pm1) = readManifestRow(s, path, 1)
      val (_, omD, pmD) = massOf(delta)
      val expRows = merged.count()
      auditAndPublish(s, path, 2, expRows, om1 + omD, pm1.add(pmD))
    }
    readTable(s, path)
      .select(col("o_custkey"), col("n_orders"),
        col("total_dec").cast("double").as("total_price"),
        col("last_orderdate"))
      .orderBy(col("o_custkey"))
  }
}
