package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.hash64

/** Second relational battery: multiset set-ops, native pivot,
  * deterministic sampling, exact percentiles, statistical aggregates,
  * HLL sketches, and an explicitly salted skew join.
  */
object RelationalQueries2 {

  /** EXCEPT ALL / INTERSECT ALL — bag semantics (duplicates counted). */
  def multisetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
    val c96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
    val exc = c95.exceptAll(c96).select(lit("except_all").as("tag"), col("o_custkey"))
    val int = c95.intersectAll(c96).select(lit("intersect_all").as("tag"), col("o_custkey"))
    exc.unionAll(int).orderBy(col("tag"), col("o_custkey"))
  }

  /** The TPC-H order-priority domain — the single source for every
    * fixed-value pivot/unpivot over it (and mirrored, deliberately as
    * literals, in the q23/q39 oracle SQL).
    */
  val Priorities: Seq[String] =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Native pivot (RelationalGroupedDataset.pivot) with a fixed value
    * list — the relational form of the reference's dense day vector.
    */
  def pivotPriorities(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Priorities)
      .agg(sum(col("o_totalprice")))
      .orderBy(col("o_orderstatus"))

  /** CUBE: all 2^k grouping combinations in one pass — completes the
    * grouping family next to ROLLUP (q10) and GROUPING SETS (q11).
    */
  def cubeRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("total_price"), col("n_orders"))
      .orderBy(col("status"), col("priority"))

  /** Unpivot (melt): wide → long, the inverse of pivotPriorities.
    * Builds the per-status revenue-by-priority wide frame, then unpivots
    * the five priority columns back to (status, priority, total) rows.
    * Null cells (combinations absent from the data) are dropped, so the
    * result equals the plain (status, priority) aggregation — which is
    * the oracle.
    */
  def unpivotRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Priorities)
      .agg(sum(col("o_totalprice")))
      .unpivot(Array(col("o_orderstatus")), Priorities.map(col).toArray,
        "priority", "total")
      .filter(col("total").isNotNull)
      .orderBy(col("o_orderstatus"), col("priority"))

  /** Deterministic 10% sample: hash-mod on the row key instead of
    * rand() — reproducible across engines/runs, the sampling pattern
    * that scales (consistent subsets across tables when keyed alike).
    */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(pmod(hash64(concat_ws("_", col("l_orderkey"), col("l_linenumber"))),
        lit(100L)) < 10)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Exact percentiles (linear interpolation) per group. */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        percentile(col("l_extendedprice"), lit(0.25)).as("p25_price"))
      .orderBy(col("l_returnflag"))

  /** Statistical aggregates: stddev/variance/corr/covar, computed in the
    * two-pass deviation form rather than Spark's single-pass moment
    * aggregates. The built-ins (`stddev_samp`/`corr`/...) merge partial
    * M2 moments with a subtraction whose catastrophic cancellation is
    * merge-order dependent — the result drifts from another engine's
    * past ~9 significant digits. Two-pass: join each group's mean back
    * to the rows, then sum same-sign deviation products — no
    * cancellation, so any engine summing the same terms agrees to
    * near-ulp. Costs one extra (broadcast) join of a #groups-row frame;
    * the fact table is still scanned twice, which at 100 TB is the
    * price of cross-engine bit-stability (use the built-ins when only
    * self-consistency matters).
    */
  def stats(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
    val mu = l.groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("mu_qty"),
        avg(col("l_extendedprice")).as("mu_price"),
        avg(col("l_discount")).as("mu_disc"),
        avg(col("l_tax")).as("mu_tax"))
    val dQty   = col("l_quantity") - col("mu_qty")
    val dPrice = col("l_extendedprice") - col("mu_price")
    val dDisc  = col("l_discount") - col("mu_disc")
    val dTax   = col("l_tax") - col("mu_tax")
    val n1 = (count(lit(1)) - 1).cast("double")
    l.join(broadcast(mu), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        sqrt(sum(dQty * dQty) / n1).as("sd_qty"),
        (sum(dPrice * dPrice) / n1).as("var_price"),
        (sum(dQty * dPrice) / sqrt(sum(dQty * dQty) * sum(dPrice * dPrice)))
          .as("corr_qty_price"),
        (sum(dDisc * dTax) / n1).as("cov_disc_tax"))
      .orderBy(col("l_returnflag"))
  }

  /** HLL sketch: approx_count_distinct. Approximate → no SQL oracle
    * (engines' sketches differ); error bound asserted in spec.
    *
    * The exact count runs as its own single-row aggregate cross-joined
    * back (BroadcastNestedLoopJoin of two 1-row sides): mixing
    * countDistinct with non-distinct aggs triggers Spark's
    * distinct-aggregate rewrite, which regroups the WHOLE scan by
    * l_orderkey and forces the HLL sketches to be built per key and
    * merged across ~N/4 groups — rewrite-time A/B at sf0.1: ~4× in
    * favor of the split shape (two column-pruned scans beat one
    * 4-level aggregate chain).
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .crossJoin(li.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("exact_orders")))
  }

  /** Generator / lateral-view: explode part names into words, count
    * occurrences (the word-count classic, relationally).
    */
  def explodeWords(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(explode(split(lower(col("p_name")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"))

  /** arg-max/arg-min per group with a deterministic struct tiebreak:
    * the highest-priced order (ties → highest orderkey) per status.
    */
  def argMax(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
          .as("top_orderkey"),
        max(col("o_totalprice")).as("top_price"),
        min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey")))
          .as("bottom_orderkey"))
      .orderBy(col("o_orderstatus"))

  /** Date arithmetic battery: day difference, month boundaries. */
  def dateArith(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).as("lag_days"),
        col("o_orderstatus"))
      .groupBy(col("o_orderstatus"))
      .agg(avg(col("lag_days")).as("avg_lag_days"),
        max(col("lag_days")).as("max_lag_days"),
        min(col("lag_days")).as("min_lag_days"))
      .orderBy(col("o_orderstatus"))
  }

  /** JSON scalar functions: parse the events.props JSON payload
    * (schema'd from_json) and aggregate an extracted field.
    */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k",
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), avg(col("k")).as("avg_k"),
        count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))

  /** Ordered string aggregation (deterministic collect): distinct order
    * statuses per priority, sorted and joined.
    */
  def stringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy(col("o_orderpriority"))

  /** Value-based RANGE window frame: rolling sum/count of orders whose
    * price is within 1000 below the current row's, per status. RANGE
    * frames are value-determined, so ties are handled identically in
    * any engine — deterministic without a tiebreak.
    *
    * SCALE NOTE: the partition key `o_orderstatus` has only 3 values,
    * so each partition is a per-status TOTAL ORDER — at 100x one
    * status's rows funnel through one task. That is inherent to the
    * query's semantics (a value-range frame needs its partition sorted
    * end to end), not an implementation choice: scaling it out requires
    * changing the question (finer partition key, or a bucketed
    * approximation of the rolling frame).
    */
  def windowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"))
      .rangeBetween(-1000L, 0L)
    // frame sum over DECIMAL(12,2)-cast prices (q58's merge-order
    // lesson): 2-dp prices cast EXACTLY, decimal addition is
    // associative, so DuckDB's segment-tree frame evaluation and
    // Spark's fold agree bitwise after the final double cast
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        sum(col("o_totalprice").cast("decimal(12,2)")).over(w)
          .cast("double").as("rolling_1k"),
        count(lit(1)).over(w).as("n_within_1k"))
      .orderBy(col("o_orderkey"))
  }

  /** Skew-handling: explicit salted equi-join. The left (fact) side gets
    * a per-row salt; the right (dim) side is replicated across all salt
    * values — hot keys spread over `salts` reducers instead of one. The
    * join RESULT is identical to the unsalted join (oracle = plain SQL
    * join); only the shuffle layout changes. At 100 TB this is the
    * escape hatch when AQE's skew split isn't available or the skew is
    * in an aggregation key.
    */
  /** Scalar (uncorrelated) subqueries through the SQL surface: the SAME
    * SQL text runs on Spark (over a temp view) and on the oracle engine
    * — demonstrating the spark.sql entry path next to the DataFrame API.
    * Catalyst plans each scalar subquery as a one-row subquery reused
    * across the scan (no rescan per row).
    */
  val ScalarSubquerySql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  o_totalprice - (SELECT avg(o_totalprice) FROM orders) AS delta_vs_global
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
      |ORDER BY o_orderkey""".stripMargin

  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(ScalarSubquerySql)
  }

  /** Window distribution functions — ntile, percent_rank, cume_dist,
    * and positional first/nth/last values over the full partition frame.
    * Deterministic because (o_totalprice, o_orderkey) is a total order
    * within each status partition.
    *
    * SCALE NOTE: same caveat as windowRangeFrame — 3-value partition
    * key means a per-status total order through one task at scale;
    * distribution functions (ntile/percent_rank/cume_dist) are
    * rank-against-the-whole-partition by definition, so this does not
    * scale out without changing semantics (e.g. approx percentiles).
    */
  def windowDistributions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wf = w.rowsBetween(Long.MinValue, Long.MaxValue)
    Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first(col("o_orderkey")).over(w).as("cheapest_orderkey"),
        nth_value(col("o_orderkey"), 2).over(wf).as("second_cheapest_orderkey"),
        last(col("o_orderkey")).over(wf).as("priciest_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** Production-shape skew join: salt ONLY detected hot keys, with the
    * detection INSIDE the plan — constructing this DataFrame is
    * side-effect-free (no driver job until the first action; the
    * previous eager-collect shape made plan-only callers pay a cluster
    * job at construction time).
    *
    * Detection: a deterministic 1-in-64 hash sample of the fact table's
    * join column, counted per key; keys whose sampled count exceeds
    * hotThreshold/64 are hot. The sample is the 100 TB posture — the
    * detection pre-agg shuffles ~1.6% of the key volume — and
    * mis-classifying a near-threshold key is correctness-neutral:
    * salting changes only the shuffle layout, never the join result
    * (a truly hot key, 100k+ rows, keeps >1000 expected sampled rows —
    * it cannot be missed). The (tiny) hot set is BROADCAST onto both
    * sides: hot fact rows take a per-row salt, matching dim rows
    * replicate `salts`×, and the cold majority joins unsalted (salt 0,
    * no replication). The result is identical to the plain join, so the
    * oracle stays the plain SQL join.
    */
  def hotKeySaltedJoinRevenue(s: SparkSession, dir: String,
      salts: Int = 8, hotThreshold: Long = 100000L): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val agg = (j: DataFrame) => j
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderstatus"))
    val sampleMod = 64L
    val hotDf = li
      .filter(pmod(hash64(concat_ws("_", col("l_orderkey"), col("l_linenumber"))),
        lit(sampleMod)) === 0)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") > hotThreshold / sampleMod)
      .select(col("l_orderkey").as("_hk"))
    val liS = li.join(broadcast(hotDf), li("l_orderkey") === col("_hk"), "left")
      .withColumn("_salt",
        when(col("_hk").isNotNull,
          pmod(hash64(concat_ws("_", col("l_orderkey"), col("l_linenumber"))),
            lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("_hk")
    val oS = o.join(broadcast(hotDf), o("o_orderkey") === col("_hk"), "left")
      .withColumn("_salt",
        explode(when(col("_hk").isNotNull,
          array((0 until salts).map(i => lit(i.toLong)): _*))
          .otherwise(array(lit(0L)))))
      .drop("_hk")
    agg(liS.join(oS,
      liS("l_orderkey") === oS("o_orderkey") && liS("_salt") === oS("_salt")))
  }

  def saltedJoinRevenue(s: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .withColumn("_salt",
        pmod(hash64(concat_ws("_", col("l_orderkey"), col("l_linenumber"))),
          lit(salts.toLong)))
    val o = Tables.orders(s, dir)
      .withColumn("_salt", explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    li.join(o, li("l_orderkey") === o("o_orderkey") && li("_salt") === o("_salt"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderstatus"))
  }
}
