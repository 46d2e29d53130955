package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NYC TLC Yellow-taxi CSV ingest with the reference's exact line-accept
  * contract (see /root/reference/ServerlessMapReduce/Sample.cs:146-166):
  *
  *   - the unit of input is a raw text line (Sample.cs:146-151);
  *   - a line is KEPT iff it splits on ',' into exactly 17 fields AND
  *     field 0 parses as an int (Sample.cs:153-157) — this silently drops
  *     the header row, blank lines, and any malformed record;
  *   - only fields 0 (probe), 1 (pickup ts), 2 (dropoff ts) and
  *     4 (trip_distance) are ever consumed (Sample.cs:154-166).
  *
  * Spark-first design notes (100 TB posture):
  *   - `spark.read.text` keeps the source splittable: a 800 MB CSV becomes
  *     many input splits instead of the reference's one-activity-per-file
  *     (Sample.cs:69-75, host.json:17 pins one mapper per node ≈ 1 MB/s).
  *   - The 17-field/int-probe filter and the 4-column projection run
  *     inside WholeStageCodegen in a single pass over each split — the
  *     same fused scan→filter→project the reference hand-codes in its
  *     mapper loop, but vectorized and parallel per split.
  *   - `input_file_name()` materializes the reference's implicit
  *     per-file grouping key (one mapper activity = one file) as an
  *     ordinary column, so the two-level mean (SURVEY.md §2.2) is plain
  *     relational algebra downstream.
  *
  * Note on Split semantics: Spark's `split(col, ",")` uses limit = -1,
  * keeping trailing empty strings — identical to C# `string.Split(',')`.
  *
  * All casts use `try_cast` / `try_to_timestamp` so the accept-probe is
  * null-on-failure under Spark 4's default ANSI mode (the reference's
  * `int.TryParse` probe, Sample.cs:154).
  */
object TaxiCsv {

  /** The full TLC Yellow 2017 header, positionally (FIXTURES.md §A). */
  val columns: Seq[String] = Seq(
    "vendor_id", "tpep_pickup_datetime", "tpep_dropoff_datetime",
    "passenger_count", "trip_distance", "ratecode_id", "store_and_fwd_flag",
    "pu_location_id", "do_location_id", "payment_type", "fare_amount",
    "extra", "mta_tax", "tip_amount", "tolls_amount",
    "improvement_surcharge", "total_amount")


  /** S2 — source enumeration (GetFileListAsync analog,
    * Sample.cs:109-126): list the files a path/glob resolves to WITHOUT
    * scanning their bytes — driver-side Hadoop FileSystem listing, the
    * same metadata-only operation the reference's blob-prefix listing
    * performs. Needed by faithful mode: files with zero accepted rows
    * still contribute zero vectors.
    *
    * Returns URI strings in `input_file_name()`'s format
    * (scheme://authority/path, e.g. "file:///x/y.csv") so the two can
    * join directly — no per-row path normalization in the scan.
    */
  def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val statuses =
      if (path.exists("*?[{".contains(_))) fs.globStatus(p)
      else {
        val st = fs.getFileStatus(p)
        if (st.isDirectory) fs.listStatus(p) else Array(st)
      }
    statuses.filter { st =>
      // skip metadata/hidden files (_SUCCESS, .crc, ...) — same
      // convention Spark's own file index applies to data sources
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
      .map { st =>
        val u = st.getPath.toUri
        s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
      }
      .toSeq.sorted
  }

  /** Raw accepted lines, still as a field array, with the source file.
    * Exactly the reference's accept rule: 17 fields + int-parsable field 0.
    * `file` is the raw input_file_name() URI (an opaque per-file key —
    * kept transform-free in the hot scan).
    */
  def acceptedLines(spark: SparkSession, path: String): DataFrame = {
    // Expand a glob to explicit files via the S2 listing (driver-side
    // metadata op) instead of handing the raw pattern to the reader:
    // Spark's FileStreamSink.hasMetadata probe getFileStatus()es a
    // SINGLE path verbatim — a glob string "does not exist" as a file,
    // and the probe logs that FileNotFoundException with a full stack
    // (the unattributable stderr trace in the r8 bench artifact). With
    // an explicit multi-file list the probe is skipped entirely; an
    // empty expansion falls through to the original path so the
    // reader's PATH_NOT_FOUND contract is unchanged.
    val paths =
      if (path.exists("*?[{".contains(_))) {
        val expanded = listFiles(spark, path)
        if (expanded.nonEmpty) expanded else Seq(path)
      } else Seq(path)
    val lines = spark.read.text(paths: _*)
      .select(input_file_name().as("file"), col("value"))
    lines
      .withColumn("fields", split(col("value"), ","))
      .filter(size(col("fields")) === 17 &&
        element_at(col("fields"), 1).try_cast("int").isNotNull)
  }

  /** acceptedLines over an EXPLICIT URI list — the reference's
    * lister→mapper hand-off (`Sample.cs:70-75` passes the lister's URI
    * array to the mappers verbatim), and the only enumeration form a
    * listing-less transport supports (http(s): plain HTTP has no
    * directory protocol — see [[HttpReadFileSystem]]). URIs are
    * status-qualified first so the `file` column (input_file_name)
    * joins against them directly. */
  def acceptedLinesListed(spark: SparkSession,
      paths: Seq[String]): DataFrame = {
    val lines = spark.read.text(normalizeUris(spark, paths): _*)
      .select(input_file_name().as("file"), col("value"))
    lines
      .withColumn("fields", split(col("value"), ","))
      .filter(size(col("fields")) === 17 &&
        element_at(col("fields"), 1).try_cast("int").isNotNull)
  }

  /** Qualify each URI through its FileSystem's status (existence check
    * + the scheme://authority/path normal form `listFiles` emits). */
  private[graft] def normalizeUris(spark: SparkSession,
      paths: Seq[String]): Seq[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    paths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val u = hp.getFileSystem(hconf).getFileStatus(hp).getPath.toUri
      s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
    }
  }

  /** Strict fixed-layout timestamp parse (custom codegen'd expression —
    * `gettimestamp`'s DateTimeFormatter path was the dominant cost of
    * the GB-scale flagship, ~20× the text scan; see ParseTs19's doc).
    * Identical accept/NULL behavior to
    * `try_to_timestamp(c, "yyyy-MM-dd HH:mm:ss")` on this corpus.
    *
    * With `opaque = true` the parse is wrapped in `Opaque` — a PUSHDOWN
    * BARRIER on the projection it appears in. Without it, Catalyst
    * substitutes the projected aliases into every downstream predicate:
    * the speed filters become ~8 copies of the parse chain inside one
    * scan Filter, re-evaluated per row (rewrite-time A/B on a 3 GB
    * corpus: an order of magnitude over the barriered form —
    * FilterExec's short-circuit
    * codegen does no common-subexpression elimination). One
    * non-deterministic field pins the WHOLE projection: no predicate
    * pushes through, so consumers' filters operate on these columns as
    * plain attributes, while the accept filter BELOW the projection
    * still fuses into the scan. See Opaque's doc for why the
    * filter-based barrier idioms (rand, opaque-true) fail.
    */
  private def parseTs(c: org.apache.spark.sql.Column, opaque: Boolean = false) = {
    val e = graft.functions.ParseTs19(org.apache.spark.sql.graft.Shims.expression(c))
    org.apache.spark.sql.graft.Shims.column(
      if (opaque) graft.functions.Opaque(e) else e)
  }

  /** Typed trips projection: only the columns the reference consumes.
    * Output: (file string, pickup_ts timestamp, dropoff_ts timestamp,
    * trip_distance double). Pushdown-barriered — consumers' filters
    * operate on these columns, never on re-derived parse chains.
    */
  def trips(spark: SparkSession, path: String): DataFrame =
    tripsProjection(acceptedLines(spark, path))

  /** trips over an explicit URI list (see acceptedLinesListed). */
  def tripsListed(spark: SparkSession, paths: Seq[String]): DataFrame =
    tripsProjection(acceptedLinesListed(spark, paths))

  private def tripsProjection(accepted: DataFrame): DataFrame =
    accepted.select(
      col("file"),
      parseTs(element_at(col("fields"), 2), opaque = true).as("pickup_ts"),
      parseTs(element_at(col("fields"), 3)).as("dropoff_ts"),
      element_at(col("fields"), 5).try_cast("double").as("trip_distance"))

  /** Fully-typed wide projection of all 17 columns (beyond the reference's
    * 4-column consumption — for the generalized engine surface).
    */
  def tripsWide(spark: SparkSession, path: String): DataFrame = {
    val f = col("fields")
    val typed = Seq(
      element_at(f, 1).try_cast("int").as("vendor_id"),
      parseTs(element_at(f, 2), opaque = true).as("tpep_pickup_datetime"),
      parseTs(element_at(f, 3)).as("tpep_dropoff_datetime"),
      element_at(f, 4).try_cast("int").as("passenger_count"),
      element_at(f, 5).try_cast("double").as("trip_distance"),
      element_at(f, 6).try_cast("int").as("ratecode_id"),
      element_at(f, 7).as("store_and_fwd_flag"),
      element_at(f, 8).try_cast("int").as("pu_location_id"),
      element_at(f, 9).try_cast("int").as("do_location_id"),
      element_at(f, 10).try_cast("int").as("payment_type"),
      element_at(f, 11).try_cast("double").as("fare_amount"),
      element_at(f, 12).try_cast("double").as("extra"),
      element_at(f, 13).try_cast("double").as("mta_tax"),
      element_at(f, 14).try_cast("double").as("tip_amount"),
      element_at(f, 15).try_cast("double").as("tolls_amount"),
      element_at(f, 16).try_cast("double").as("improvement_surcharge"),
      element_at(f, 17).try_cast("double").as("total_amount"))
    acceptedLines(spark, path).select(col("file") +: typed: _*)
  }
}
