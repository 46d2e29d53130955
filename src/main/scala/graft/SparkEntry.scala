package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 (or a §7
  * extension op), expressed Spark-first; `oracleSql` holds the ANSI-SQL
  * equivalent DuckDB runs on the same parquet tables for the t2
  * correctness gate. Column names and ordering are aligned between the
  * two on purpose — the driver hashes values after sorting columns by
  * name.
  *
  * The taxi CSV pipeline itself (graft.sources.TaxiCsv + TaxiSpeed) is
  * exercised against generated fixture CSVs in the test suite (the TLC
  * CSVs are not on disk); here the same two-level-mean semantics run on
  * the `events` table (ts/value stand in for pickup/speed, and
  * user_id % 4 stands in for the per-file grouping — SURVEY.md §7.1).
  */
object SparkEntry {

  private def ev(s: SparkSession, dir: String) = Tables.events(s, dir)
  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's query shape (avg measure by day-of-week, Sunday=0)
    * on the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    TwoLevelMean.weighted(
      ev(spark, "/root/testdata/sf0.001"),
      (dayofweek(col("ts")) - 1).cast("int"), col("value"),
      keyName = "day", outName = "avg_value"
    ).orderBy("day")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── Flagship analogs (SURVEY.md §2.2 semantics on `events`) ──────────
    // Faithful mode: unweighted mean of zero-filled per-group means;
    // user_id % 4 plays the reference's one-mapper-per-file grouping.
    "events_speed_faithful" -> ((s, dir) =>
      TwoLevelMean.faithful(
        ev(s, dir).select((col("user_id") % 4).as("grp"),
          (dayofweek(col("ts")) - 1).cast("int").as("day"), col("value")),
        col("grp"), col("day"), col("value"), 0 to 6,
        keyName = "day", outName = "avg_value"
      ).orderBy("day")),

    // Weighted (corrected) mode: plain global mean per day.
    "events_speed_weighted" -> ((s, dir) =>
      TwoLevelMean.weighted(
        ev(s, dir), (dayofweek(col("ts")) - 1).cast("int"), col("value"),
        keyName = "day", outName = "avg_value"
      ).orderBy("day")),

    // ── Core relational: aggregation (S4/M5/R1 generalized) ──────────────
    "q1_pricing_summary" -> ((s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") <= expr("TIMESTAMP '1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          avg("l_quantity").as("avg_qty"),
          avg("l_extendedprice").as("avg_price"),
          avg("l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(

    "events_speed_faithful" ->
      """WITH base AS (
        |  SELECT user_id % 4 AS grp, CAST(dayofweek(ts) AS INT) AS day, value
        |  FROM events
        |), groups AS (SELECT DISTINCT grp FROM base),
        |days AS (SELECT * FROM (VALUES (CAST(0 AS INT)),(1),(2),(3),(4),(5),(6)) d(day)),
        |per_grp AS (
        |  SELECT g.grp, d.day, coalesce(avg(b.value), 0.0) AS per_grp_avg
        |  FROM groups g CROSS JOIN days d
        |  LEFT JOIN base b ON b.grp = g.grp AND b.day = d.day
        |  GROUP BY g.grp, d.day
        |)
        |SELECT day, avg(per_grp_avg) AS avg_value
        |FROM per_grp GROUP BY day ORDER BY day""".stripMargin,

    "events_speed_weighted" ->
      """SELECT CAST(dayofweek(ts) AS INT) AS day, avg(value) AS avg_value
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS sum_charge,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
