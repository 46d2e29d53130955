package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator battery (SURVEY.md §7.2 step 1-2).
  *
  * The reference has exactly one hard-coded pipeline (SURVEY.md §2.3
  * lists joins/windows/sorts/set-ops as absent), so "same capabilities,
  * generalized" means a complete relational surface. Each query here is
  * a thin, deliberately-shaped Spark plan over the TPC-H-ish tables,
  * paired with DuckDB oracle SQL in SparkEntry for the t2 gate.
  *
  * Scale posture notes (100 TB):
  *   - `nation`/`region` are bounded dimension tables (25/5 rows at any
  *     SF) — always broadcast, never shuffled.
  *   - fact⋈fact joins (orders⋈lineitem, customer⋈orders) shuffle on
  *     the join key and rely on AQE for skew/plan fixes; no collects.
  *   - every aggregation is a plain groupBy → partial+final hash agg.
  *   - top-k uses orderBy+limit → TakeOrderedAndProject (no full sort
  *     materialization, per-partition heaps + single small merge).
  */
object RelationalQueries {

  // ── Filters & projection (F2/S4 generalized) ──────────────────────────
  /** Pushed-down predicate + column pruning: the parquet scan should
    * read 4 columns and carry both filters as PushedFilters.
    */
  def filterProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 &&
        col("l_shipdate") >= expr("TIMESTAMP '2000-01-01 00:00:00'"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // ── Joins ─────────────────────────────────────────────────────────────
  /** Two fact-fact shuffle joins + group + top-k (TPC-H Q3 shape). */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
    val l = Tables.lineitem(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(l("l_orderkey"), o("o_orderdate"))
      // revenue sums DECIMAL(18,4)-cast terms (q58's merge-order
      // lesson): the per-item double product is engine-identical,
      // decimal addition is exact and associative, final cast to
      // double is deterministic — bit-exact under any agg schedule
      .agg(sum((l("l_extendedprice") * (lit(1.0) - l("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Star join through broadcast dimensions: lineitem⋈supplier⋈nation⋈
    * region. nation/region are size-bounded → explicit broadcast hints;
    * supplier joins by key (AQE may still broadcast it at small SF).
    */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    l.join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left-semi join: customers with at least one URGENT open order. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join: customers with no orders placed in 2001. */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 2001)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Left-outer join with zero-fill: every nation, its customer count
    * and balance sum (0 for nations with no customers — same dense-key
    * pattern as the reference's zero-filled day vector, Sample.cs:197).
    */
  def leftOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    // Aggregate the fact side BEFORE the join: the dimension join then
    // touches 25 rows, not every customer row.
    val perNation = c.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("c_acctbal")).as("bal"))
    n.join(perNation, n("n_nationkey") === perNation("c_nationkey"), "left")
      .select(col("n_name"),
        coalesce(col("cnt"), lit(0L)).as("n_customers"),
        coalesce(col("bal"), lit(0.0)).as("total_acctbal"))
      .orderBy(col("n_name"))
  }

  /** Full-outer join: customer-count vs supplier-count per nation key. */
  def fullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_customers"))
    val sup = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sup, col("nk_c") === col("nk_s"), "full_outer")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy(col("nationkey"))
  }

  // ── Aggregation variants ─────────────────────────────────────────────
  /** Distinct aggregates: per order-status, distinct customers/priorities. */
  def distinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        countDistinct(col("o_orderpriority")).as("n_prios"),
        sum_distinct(col("o_custkey")).as("sum_distinct_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  /** ROLLUP over (region, nation): subtotals + grand total. NULL group
    * labels are disambiguated with grouping() so the oracle compare is
    * exact.
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_custs"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("total_bal"), col("n_custs"))
      .orderBy(col("region"), col("nation"))
  }

  /** Explicit GROUPING SETS: ((status), (priority), ()). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.createOrReplaceTempView("orders_gs")
    s.sql("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             sum(o_totalprice) AS total_price,
             count(*) AS n_orders
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""")
  }

  /** HAVING: nations whose customer balance sum exceeds a threshold. */
  def havingFilter(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(sum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_custs"))
      .filter(col("total_bal") > 10000.0)
      .orderBy(col("c_nationkey"))

  /** Conditional aggregation (manual pivot on order priority class). */
  def casePivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))
          .otherwise(lit(0.0))).as("urgent_total"),
        sum(when(col("o_orderpriority") === "2-HIGH", col("o_totalprice"))
          .otherwise(lit(0.0))).as("high_total"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          col("o_totalprice")).otherwise(lit(0.0))).as("other_total"),
        count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("n_urgent"))
      .orderBy(col("o_orderstatus"))

  // ── Windows ──────────────────────────────────────────────────────────
  /** Ranking windows: top-3 orders per customer by price (rank with a
    * deterministic key tiebreak), plus dense_rank and a running count
    * frame.
    */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        dense_rank().over(w).as("drk"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Analytic windows over the event stream: running sum and lag delta
    * per user. Frame = rows unbounded-preceding..current; ordering has a
    * deterministic event_id tiebreak (and the oracle casts DuckDB's
    * nanosecond ts down to microseconds to match Spark's TimestampType).
    */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // the running sum folds DECIMAL(18,6)-cast terms (q58's merge-
    // order lesson, applied to window frames: DuckDB evaluates frame
    // sums through a segment tree whose association differs from
    // Spark's streaming fold — decimal addition is associative, so
    // both yield the identical total); double→decimal quantization of
    // each term is the same IEEE-defined rounding on both engines
    e.select(col("user_id"), col("event_id"), col("value"),
        sum(col("value").cast("decimal(18,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // ── Sort / limit ─────────────────────────────────────────────────────
  /** Global top-k: TakeOrderedAndProject, not a full sort. */
  def topkOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  // ── Set operations ───────────────────────────────────────────────────
  /** UNION ALL / INTERSECT / EXCEPT of customer-key sets, tagged. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val with95 = o.filter(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey")).distinct()
    val with96 = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey")).distinct()
    val both = with95.intersect(with96).select(lit("both").as("tag"), col("o_custkey"))
    val only95 = with95.except(with96).select(lit("only95").as("tag"), col("o_custkey"))
    val only96 = with96.except(with95).select(lit("only96").as("tag"), col("o_custkey"))
    both.unionAll(only95).unionAll(only96)
      .orderBy(col("tag"), col("o_custkey"))
  }

  // ── Scalar function batteries ────────────────────────────────────────
  /** String functions over part: upper/lower/substring/length/concat/
    * regexp/replace/trim — all codegen'd built-ins.
    */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("upper_name"),
        lower(col("p_brand")).as("lower_brand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        trim(col("p_name")).as("trimmed"),
        col("p_name").contains("a").as("has_a"))
      .orderBy(col("p_partkey"))

  /** Date/time functions over orders (ms-precision timestamps). */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("total"))
      .orderBy(col("yr"), col("mo"))

  /** Math functions aggregated over lineitem. */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      sum(abs(col("l_discount") - lit(0.05))).as("sum_abs"),
      sum(sqrt(col("l_quantity"))).as("sum_sqrt"),
      sum(log(col("l_extendedprice") + lit(1.0))).as("sum_ln"),
      sum(pow(col("l_discount"), 2)).as("sum_sq"),
      max(greatest(col("l_tax"), col("l_discount"))).as("max_rate"),
      min(least(col("l_tax"), col("l_discount"))).as("min_rate"))

  /** Decorrelated scalar subquery: customers above their nation's mean
    * balance (expressed as agg + broadcast-joinable derived dim).
    */
  def aboveNationAvg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val perNation = c.groupBy(col("c_nationkey").as("nk"))
      .agg(avg(col("c_acctbal")).as("nation_avg"))
    c.join(broadcast(perNation), c("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }
}
