package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-3 relational battery: correlated-subquery shapes (EXISTS /
  * NOT EXISTS / correlated aggregate), multi-fact star joins, ratio and
  * distribution aggregates, and the regex/array scan batteries — the
  * remaining ANSI-surface categories SURVEY.md §2.3 marks absent from
  * the reference.
  *
  * Scale posture (100 TB):
  *   - EXISTS/NOT EXISTS are expressed as left-semi / left-anti joins —
  *     Catalyst's native decorrelation target — shuffling once on the
  *     join key; never a per-row subquery.
  *   - the correlated aggregate (q45) is the two-phase form: a
  *     map-side-combinable per-key aggregate joined back to the fact,
  *     i.e. one extra shuffle instead of a rescan per row.
  *   - regex/array batteries are shuffle-free codegen'd scans.
  */
object RelationalQueries3 {

  /** q41 — TPC-H Q4 shape: orders with at least one late-shipped item,
    * counted per priority. Left-semi join IS the EXISTS plan: the probe
    * side streams, the build side dedups, no row explosion for orders
    * with many matching items.
    */
  def existsLateShip(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** q42 — NOT EXISTS as left-anti: customers with no large order,
    * profiled per market segment. Anti join shuffles once on custkey;
    * the filter on the build side prunes before the shuffle.
    */
  def noBigOrderCustomers(s: SparkSession, dir: String,
      threshold: Double = 400000.0): DataFrame = {
    val c = Tables.customer(s, dir)
    val big = Tables.orders(s, dir).filter(col("o_totalprice") > threshold)
    // avg spelled as exact-decimal sum ÷ count (q58's merge-order
    // lesson): 2-dp balances cast EXACTLY to DECIMAL(12,2), the sum
    // is associative, and the single double divide is IEEE-identical
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("c_acctbal").cast("decimal(12,2)")).cast("double")
          / count(lit(1)).cast("double")).as("avg_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** q43 — TPC-H Q13 shape: customer order-count distribution. Left
    * outer join keeps zero-order customers (count(o_orderkey) skips the
    * null), then a second, much smaller aggregation over the counts —
    * the classic two-level shuffle where level 2's cardinality is tiny.
    */
  def custOrderDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("c_count"))
  }

  /** q44 — TPC-H Q14 shape: promo revenue share per ship month. The
    * part table is the dimension side — broadcast so the fact scan
    * never shuffles; the conditional numerator and the total share one
    * aggregate pass.
    */
  def promoRevenueShare(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP '2000-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '2001-01-01 00:00:00'"))
    val p = Tables.part(s, dir)
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0)))
          .as("promo_revenue"),
        sum(disc).as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
      .orderBy(col("ship_month"))
  }

  /** q45 — TPC-H Q17 shape: revenue from below-average-quantity line
    * items. The correlated `avg per part` runs as its own two-phase
    * aggregate and joins back on partkey — one extra shuffle, identical
    * arithmetic to the correlated form, and the oracle SQL uses the
    * same decorrelated CTE so both engines sum the same rows.
    */
  def smallQtyRevenue(s: SparkSession, dir: String,
      frac: Double = 0.5): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val avgQty = l.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    l.join(avgQty, l("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(frac) * col("avg_qty"))
      .agg(sum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_items"))
  }

  /** q46 — regex battery over documents: extract-first-match, global
    * replace, and a match predicate, all codegen'd in one scan pass.
    * Patterns stay in the RE2 ∩ Java-regex common subset so the oracle
    * engine compiles the identical automaton.
    */
  def regexBattery(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      regexp_extract(col("text"), "sp\\w+", 0).as("first_sp_word"),
      length(regexp_replace(col("text"), "[aeiou]", "")).as("len_no_vowels"),
      col("text").rlike("join\\s+order").cast("int").as("has_join_order"),
      size(split(col("text"), "\\bscan\\b")).minus(1).as("n_scan"))
    .orderBy(col("doc_id"))

  /** q47 — array battery: tokenize once, then pure array ops (sort,
    * distinct, slice, membership, endpoints) — all scan-local, no
    * shuffle, no explode (the row count never changes).
    */
  def arrayBattery(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        size(col("w")).as("n_words"),
        size(array_distinct(col("w"))).as("n_distinct"),
        concat_ws(",", slice(array_sort(array_distinct(col("w"))), 1, 3))
          .as("first3_sorted"),
        element_at(col("w"), -1).as("last_word"),
        array_contains(col("w"), "spark").cast("int").as("has_spark"))
      .orderBy(col("doc_id"))

  /** q48 — histogram + share-of-total: fixed-width value buckets, then
    * the global share via a one-row total aggregate broadcast-joined
    * back (the q21/q38 plan shape). An unpartitioned window would give
    * the same numbers but funnels the whole bucket table through ONE
    * WindowExec task — bounded today, but the aggregate+broadcast form
    * stays parallel at any bucket count and keeps the bench log free of
    * single-partition warnings.
    */
  def priceHistogram(s: SparkSession, dir: String,
      width: Double = 50000.0): DataFrame = {
    val agg = Tables.orders(s, dir)
      .groupBy(floor(col("o_totalprice") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("bucket_value"))
    val total = agg.agg(sum(col("n_orders")).as("total_orders"))
    agg.crossJoin(broadcast(total))
      .withColumn("pct_orders",
        lit(100.0) * col("n_orders") / col("total_orders"))
      .drop("total_orders")
      .orderBy(col("bucket"))
  }

  /** q49 — TPC-H Q5 shape: the full six-table star — region filter down
    * through nation to customer AND supplier, joined to the
    * orders⋈lineitem fact spine, keeping only locally-supplied orders
    * (c_nationkey = s_nationkey). nation/region broadcast always;
    * supplier/customer shuffle on their keys; the fact joins shuffle
    * once each on orderkey/custkey/suppkey.
    */
  def localSupplierRevenue(s: SparkSession, dir: String,
      regionName: String = "ASIA"): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === regionName)
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val c = Tables.customer(s, dir)
      .join(broadcast(n.select(col("n_nationkey").as("cn_key"), col("n_name"))),
        col("c_nationkey") === col("cn_key"))
    val sup = Tables.supplier(s, dir)
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    c.join(o, col("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey") &&
        col("c_nationkey") === sup("s_nationkey"))
      .groupBy(col("n_name"))
      // revenue sums DECIMAL(18,4)-cast terms (q58's merge-order
      // lesson): exact associative addition → bit-exact vs the oracle
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** q53 — TPC-H Q21 shape (suppliers who kept waiting): for finished
    * orders, count per supplier the late line items where (a) another
    * supplier participated in the same order and (b) NO other supplier
    * in that order was also late — the sole bottleneck supplier. "Late"
    * = shipped more than 30 days after the order date (this schema has
    * no commit/receipt dates).
    *
    * The classic three-way correlated shape: one EXISTS and one NOT
    * EXISTS against the same fact, both correlated on the order key
    * with a supplier inequality. Spark-first: both decorrelate to
    * left-semi / left-anti joins keyed on l_orderkey with the
    * inequality as a residual condition — so all three legs (base,
    * semi, anti) shuffle on the SAME key and co-partition; no per-row
    * subquery, no rescan. The lateness predicate needs o_orderdate, so
    * the anti leg reuses the already-joined late-items relation (same
    * order key → same order row → same threshold on both engines).
    */
  def soleLateSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val lateItems = l
      .join(Tables.orders(s, dir), l("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"), col("o_orderstatus"))
    val others = l.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey"))
    val lateOthers = lateItems.select(col("l_orderkey").as("o3_orderkey"),
      col("l_suppkey").as("o3_suppkey"))
    val base = lateItems.filter(col("o_orderstatus") === "F")
      .join(others,
        col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o3_orderkey") &&
          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
    base.join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** q50 — TPC-H Q15 shape: top supplier(s) by shipped revenue. The
    * per-supplier revenue aggregate is computed once and the "equal to
    * the max" filter is a one-row max aggregate broadcast-joined back —
    * a parallel broadcast-hash join at any scale, instead of
    * max().over(Window.partitionBy()) which pushes every per-supplier
    * row through ONE task (q21/q38's shape). No rescan of lineitem, no
    * collect.
    */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP '2000-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '2000-07-01 00:00:00'"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
      // persist: rev feeds BOTH the max aggregate and the filter join.
      // Without it, Spark evaluates the aggregate subtree once per
      // consumer; exchange reuse dedupes the shuffle WRITE, but each
      // consumer's final merge re-adds fetched blocks in its own
      // nondeterministic order, so the two double sums can drift at ulp
      // level and `total_revenue === max_rev` could then match NOTHING
      // (intermittently empty result). Caching the per-supplier frame
      // (#suppliers rows — bounded, small) pins ONE set of values that
      // both consumers read, making the exact-equality join total.
      .persist()
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev
      .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** q54 — bilateral trade volume (TPC-H Q7's shape): revenue shipped
    * between a nation PAIR, both directions, by ship year — the
    * multi-hop star query (lineitem→supplier→nation, lineitem→orders→
    * customer→nation) every warehouse benchmark leans on.
    *
    * Scale posture: the nation filter lands FIRST and broadcasts — the
    * two 1-row nation slices prune supplier and customer to the pair's
    * members before any fact-side join, so the big lineitem relation
    * only ever joins against pair-member keys (at 100 TB: two shuffle
    * joins on l_suppkey / l_orderkey with map-side-pruned builds; the
    * date filter pushes to the parquet scan). The direction predicate
    * runs on two broadcast-joined label columns, not on re-derived
    * lookups.
    */
  def volumeShipping(s: SparkSession, dir: String,
      nationA: String = "NATION_13", nationB: String = "NATION_19"): DataFrame = {
    val n = Tables.nation(s, dir)
      .filter(col("n_name").isin(nationA, nationB))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(n.select(col("n_nationkey").as("s_nationkey"),
        col("n_name").as("supp_nation"))), "s_nationkey")
      .select(col("s_suppkey").as("l_suppkey"), col("supp_nation"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(n.select(col("n_nationkey").as("c_nationkey"),
        col("n_name").as("cust_nation"))), "c_nationkey")
      .select(col("c_custkey").as("o_custkey"), col("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate").between("1995-01-01", "1996-12-31"))
      .join(supp, "l_suppkey")
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, "o_custkey")
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB)
        || (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      // DECIMAL(18,4) term sum (q58's merge-order lesson)
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** q55 — national market share (TPC-H Q8's shape): one supplier
    * nation's share of a region's customers' spend on a part type, by
    * order year — conditional aggregation over an 8-table star.
    *
    * Scale posture: every dimension prunes BEFORE touching lineitem —
    * the region→nation slice broadcasts onto customer, the filtered
    * part type broadcasts onto the fact scan, orders carries its
    * pushed-down date range — so the fact relation flows through two
    * shuffle joins (partkey prune is a broadcast probe) already cut to
    * the region/type/date subset. The share itself is one grouped
    * conditional sum over the joined slice; no second pass.
    */
  def marketShare(s: SparkSession, dir: String,
      nation: String = "NATION_3", region: String = "EUROPE",
      ptype: String = "ECONOMY"): DataFrame = {
    val euroNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === region)
        .select(col("r_regionkey").as("n_regionkey"))), "n_regionkey")
      .select(col("n_nationkey").as("c_nationkey"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(euroNations), "c_nationkey")
      .select(col("c_custkey").as("o_custkey"))
    val ords = Tables.orders(s, dir)
      .filter(col("o_orderdate").between("1995-01-01", "1996-12-31"))
      .join(cust, "o_custkey")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    val partF = Tables.part(s, dir)
      .filter(col("p_type") === ptype)
      .select(col("p_partkey").as("l_partkey"))
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
        "s_nationkey")
      .select(col("s_suppkey").as("l_suppkey"), col("n_name").as("nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(partF), "l_partkey")
      .join(ords, "l_orderkey")
      .join(suppNation, "l_suppkey")
      .withColumn("volume",
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      // both sums fold DECIMAL(18,4)-cast terms (q58's merge-order
      // lesson); the share is ONE IEEE divide of the two exact totals
      .agg((sum(when(col("nation") === nation, col("volume"))
          .otherwise(lit(0)).cast("decimal(18,4)")).cast("double")
        / sum(col("volume").cast("decimal(18,4)")).cast("double"))
        .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** q56 — returned-item revenue ranking (TPC-H Q10's shape): the top
    * customers by revenue on 'R'-flagged (returned) line items in a
    * one-year order window — the churn-triage report. The global top-20
    * is TakeOrderedAndProject (distributed heap-k over the per-customer
    * aggregate, never a total sort); nation broadcasts; the fact joins
    * shuffle once each on orderkey/custkey with the date filter pushed
    * to the orders scan and the flag filter to the lineitem scan.
    */
  def returnedRevenue(s: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1996-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val c = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
        "c_nationkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(topK)
  }

  /** q57 — disjunctive bracket revenue (TPC-H Q19's shape): revenue
    * from three (brand, size-range, quantity-range) brackets OR'd
    * together — the predicate shape that defeats naive pushdown
    * splitting. The part dimension broadcasts (brand/size prune it
    * first); the OR predicate evaluates post-join in one codegen'd
    * conjunction pass; lineitem never shuffles — a single broadcast
    * probe and a one-row aggregate.
    */
  def bracketRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select(col("p_partkey").as("l_partkey"), col("p_brand"), col("p_size"))
    def bracket(brand: String, maxSize: Int, qLo: Double, qHi: Double) =
      col("p_brand") === brand && col("p_size").between(1, maxSize) &&
        col("l_quantity").between(qLo, qHi)
    Tables.lineitem(s, dir)
      .join(broadcast(p), "l_partkey")
      .filter(bracket("Brand#1", 15, 1, 11) ||
        bracket("Brand#2", 25, 10, 20) ||
        bracket("Brand#3", 35, 20, 30))
      // DECIMAL(18,4) term sum (q58's merge-order lesson): the single
      // global group is exactly where double merge-order drift bites
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q58 — product-line profit by supplier nation and order year
    * (TPC-H Q9's shape, adapted: this schema has no partsupp, so unit
    * cost is proxied as 60% of p_retailprice — same join graph, same
    * grouping, deterministic and oracle-mirrored). Profit =
    * Σ extendedprice·(1−discount) − 0.6·retailprice·quantity over
    * every lineitem whose part name matches the product line.
    *
    * Scale posture: the name-filtered part slice and the
    * supplier→nation map are both dimension-sized and BROADCAST — the
    * fact table takes two broadcast probes (the part probe also acts
    * as the product-line semi-join, cutting lineitem before anything
    * else) and exactly one shuffle join, on orderkey against the
    * pruned two-column orders projection, before the (nation, year)
    * aggregate. Q9 is the classic join-order trap — probing part LAST
    * would shuffle the whole fact table twice; probing it FIRST makes
    * the selective dimension do the pruning.
    */
  /** q59 — best supplier per part (TPC-H Q2's shape, adapted: this
    * schema has no partsupp, so the part↔supplier relationship is
    * DERIVED as the distinct (l_partkey, l_suppkey) pairs that
    * actually shipped): for every part of one type, the region
    * supplier with the highest account balance that has shipped it,
    * ties to the smaller supplier key; presented top-`topK` by
    * balance. The correlated-argmax-over-a-junction-relation shape.
    *
    * Scale posture: both dimension slices prune before the fact scan —
    * the type-filtered part probe broadcasts onto lineitem (also the
    * junction semi-join), and the region→nation→supplier chain
    * broadcasts onto the junction rows. The junction DISTINCT is the
    * one fact-sized shuffle (its key (partkey, suppkey) is the
    * aggregate's prefix, so no second exchange); the argmax is a
    * map-side-combining max(struct) — no per-part rank window — and
    * the presentation top-k is a TakeOrdered heap, not a total sort.
    */
  def bestSupplierPerPart(s: SparkSession, dir: String,
      region: String = "EUROPE", ptype: String = "SMALL",
      topK: Int = 100): DataFrame = {
    val regionNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === region)
        .select(col("r_regionkey").as("n_regionkey"))), "n_regionkey")
      .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(regionNations), "s_nationkey")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
    val parts = Tables.part(s, dir)
      .filter(col("p_type") === ptype)
      .select(col("p_partkey").as("l_partkey"), col("p_name"))
    val junction = Tables.lineitem(s, dir)
      .join(broadcast(parts), "l_partkey")
      .select(col("l_partkey"), col("l_suppkey"), col("p_name"))
      .distinct()
    junction.join(broadcast(supp), "l_suppkey")
      // max(struct): balance desc, then smaller suppkey (negated key)
      .groupBy(col("l_partkey").as("p_partkey"), col("p_name"))
      .agg(max(struct(col("s_acctbal").as("b"),
        (-col("l_suppkey")).as("nk"), col("l_suppkey").as("sk"),
        col("s_name").as("sn"), col("n_name").as("nn"))).as("pick"))
      .select(col("p_partkey"), col("p_name"),
        col("pick.b").as("s_acctbal"), col("pick.sk").as("s_suppkey"),
        col("pick.sn").as("s_name"), col("pick.nn").as("n_name"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"))
      .limit(topK)
  }

  def profitByNationYear(s: SparkSession, dir: String,
      line: String = "red"): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_name").contains(line))
      .select(col("p_partkey").as("l_partkey"), col("p_retailprice"))
    val supp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))),
        "s_nationkey")
      .select(col("s_suppkey").as("l_suppkey"), col("n_name"))
    Tables.lineitem(s, dir)
      .join(broadcast(p), "l_partkey")
      .join(broadcast(supp), "l_suppkey")
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("int").as("o_year"))
      // Per-item margin is one identical IEEE expression in both
      // engines; the SUM runs over DECIMAL(18,4)-cast terms because a
      // double sum is order-dependent and at ~1e3 items per group the
      // merge-order drift (~1e-3 absolute) straddles the gate's
      // 9-significant-digit rounding — decimal addition is exact and
      // associative, so every partial-agg schedule yields the same total.
      // The exact decimal total is then cast to DOUBLE for the output
      // column: the external gate only normalizes float numerics, and
      // decimal→double of identical decimals is deterministic.
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - lit(0.6) * col("p_retailprice") * col("l_quantity"))
        .cast("decimal(18,4)")).cast("double").as("profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** q67 — TPC-H Q18 shape: large-volume orders (total quantity above a
    * fixed threshold) with their customer. Reference behavior cited for
    * the family at `Sample.cs:1-264` (the reference has no relational
    * surface; SURVEY §2.3 marks this absent category).
    *
    * Scale posture: the HAVING filter runs ON the aggregate BEFORE any
    * join — lineitem collapses to one row per order (map-side partial
    * sum), and only threshold survivors reach the joins. The orders
    * join reuses the aggregate's hash partitioning on the SAME key
    * (orderkey), so AQE plans one co-partitioned join with no extra
    * exchange of the agg side. No broadcast hint on either join: the
    * survivor count is proportional to |orders| (a fixed per-order
    * quantity threshold keeps a constant FRACTION, not a constant
    * COUNT), so at 100 TB neither side is broadcastable and the shuffle
    * join on the already-partitioned key is the right plan; at test SF
    * AQE downgrades the small sides to broadcast on its own. The final
    * top-100 is a TakeOrdered, never a global sort.
    */
  def bigOrders(s: SparkSession, dir: String,
      minQty: Double = 250.0, topK: Int = 100): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(topK)
  }

  /** q68 — TPC-H Q22 shape: "dormant customers" — above-average
    * positive account balance but NO orders since `cutoff`, rolled up
    * per nation. The classic anti-join + global-threshold pattern.
    * (Q22 proper anti-joins ALL orders; this corpus generates orders
    * for every customer, so the faithful form returns the empty
    * relation — the recency cutoff keeps the identical plan shape on a
    * non-degenerate answer.)
    *
    * FP discipline (the q50/t19 two-branch-drift lesson, taken one
    * step further): the threshold is an AVERAGE consumed in a filter,
    * and avg-as-double differs between engines in the last ulp on
    * merge order — enough to flip boundary customers. So there is no
    * division and no double anywhere in the decision: balances cast to
    * DECIMAL(12,2) (EXACT here — the generated balances are 2-dp
    * money, so the cast never rounds), and `bal > S/N` is evaluated as
    * `bal·N > S` in exact decimal×bigint arithmetic. Both engines
    * agree bit-for-bit; only the final nation total is cast to double
    * for the gate.
    *
    * Scale posture: the threshold is ONE broadcast row (sum + count);
    * the anti-join keys on custkey (shuffle equi-join — at 100 TB the
    * distinct-buyer side is not broadcastable); the nation dim
    * broadcasts. One aggregation per side, nothing quadratic.
    */
  def lostCustomers(s: SparkSession, dir: String,
      cutoff: String = "2000-01-01"): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val stats = c.filter(col("bal") > 0)
      .agg(sum(col("bal")).as("s"), count(lit(1)).as("n"))
    c.crossJoin(broadcast(stats))
      .filter(col("bal") * col("n") > col("s"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit(cutoff).cast("date"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("bal")).cast("double").as("total_acctbal"))
      .orderBy(col("nation"))
  }

  /** q69 — supplier diversity per part spec (the TPC-H Q16 shape:
    * "how many DISTINCT suppliers can deliver each surviving
    * brand/type/size combination, excluding blacklisted suppliers"):
    * the part⋈junction distinct-count with a NOT-IN supplier
    * exclusion. The junction derives from lineitem like q59's (the
    * schema has no partsupp table); the Q16 complaint filter maps to
    * the negative-balance suppliers this schema can express.
    *
    * Scale posture: the part dim filters FIRST (brand/type/size
    * predicates prune most parts) and BROADCASTS onto the fact scan —
    * lineitem never shuffles for the join; the excluded-supplier set
    * is a handful of keys, broadcast as a left_anti probe (NOT IN on
    * a non-null key column = anti join, no null trap here since
    * s_suppkey is the primary key). The only shuffle is the final
    * distinct-count aggregate, keyed by the group columns — and the
    * pre-aggregate relation was already cut to distinct
    * (partkey, suppkey) pairs map-side by the same aggregate.
    */
  def supplierCounts(s: SparkSession, dir: String,
      exclBrand: String = "Brand#45", exclTypePrefix: String = "PROMO",
      sizes: Seq[Int] = Seq(49, 14, 23, 45, 19, 3, 36, 9)): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= exclBrand &&
        !col("p_type").startsWith(exclTypePrefix) &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey").as("l_partkey"), col("p_brand"),
        col("p_type"), col("p_size"))
    val blacklisted = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").as("l_suppkey"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), "l_partkey")
      .join(broadcast(blacklisted), Seq("l_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** q70 — excess-stock suppliers (the TPC-H Q20 shape: the nested
    * semi-join chain part-filter → per-(part, supplier) availability
    * vs. windowed demand → supplier membership). The schema has no
    * partsupp, so availability derives from the junction itself (one
    * stock unit per historical line — q59's derived-junction
    * convention) and demand is the year's shipped quantity; Q20's rule
    * availqty > ½·demand is kept verbatim as 2·avail > demand. Output
    * is per-supplier: how many of their red parts sit in excess — on
    * the uniform synthetic data every supplier carries SOME excess
    * part (as in Q20's forest-parts run on uniform TPC-H), so the
    * per-supplier counts are where the variance lives.
    *
    * Exactness contract: avail is a bigint count; demand sums
    * DECIMAL(12,2)-cast quantities (exact, associative — the q58
    * lesson; a double sum here would straddle the 9-digit gate on
    * merge order) and the threshold compare 2·avail > demand is exact
    * integer-vs-decimal comparison on both engines.
    *
    * Scale posture: the name-filtered part set broadcasts onto ONE
    * lineitem scan; the pair aggregate is the only fact shuffle
    * (map-side combined); the supplier dim broadcasts onto the
    * pair-aggregated (already tiny) relation. Nothing quadratic, no
    * correlated re-scan of lineitem — the Q20 subquery chain is
    * flattened into one pass.
    */
  def excessStockSuppliers(s: SparkSession, dir: String,
      namePrefix: String = "red", year: Int = 1998): DataFrame = {
    val rp = Tables.part(s, dir)
      .filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey").as("l_partkey"))
    val pairs = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_shipdate"))
      .join(broadcast(rp), "l_partkey")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("avail"),
        sum(when(org.apache.spark.sql.functions.year(col("l_shipdate")) === year,
          col("l_quantity").cast("decimal(12,2)"))
          .otherwise(lit(0).cast("decimal(12,2)"))).as("demand"))
    pairs.filter(lit(2) * col("avail") > col("demand"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_excess_parts"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_excess_parts"))
      .orderBy(col("s_name"))
  }

  /** q71 — customer lifetime-value deciles: every customer globally
    * ranked by exact total spend, cut into `tiles` equal-population
    * tiles, reported as per-tile (population, total/min/max spend) —
    * the segmentation table a marketing/finance pipeline refreshes
    * nightly.
    *
    * THE point of this operator is the ranking's scale posture: a
    * global rank is usually written as an UNPARTITIONED window, which
    * moves every row to one task — the classic scale-killer this
    * library bans. Instead the aggregated customer relation is
    * range-partitioned and sorted on the rank key, per-partition row
    * counts (one long per partition — bounded driver state) become
    * per-partition OFFSETS, and the global rank is offset +
    * row_number over the PARTITION-LOCAL window. Every shuffle is the
    * range exchange; no single-partition stage exists at any scale.
    * The relation is persisted before branching so the two consumers
    * (counts, ranked rows) see the SAME range partitioning.
    *
    * Exactness contract: spend sums DECIMAL(18,2) (exact,
    * associative); (spend desc, custkey) is a total order, so ranks —
    * and therefore tile boundaries tile = (rank−1)·tiles div N — are
    * integers identical to the oracle's row_number formulation; the
    * per-tile aggregates cast to double only at presentation.
    */
  def customerValueTiles(s: SparkSession, dir: String,
      tiles: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("spend"))
    val sorted = cust
      .repartitionByRange(32, col("spend").desc, col("o_custkey"))
      .sortWithinPartitions(col("spend").desc, col("o_custkey"))
      .withColumn("pid", spark_partition_id())
      .persist()
    val n = sorted.count() // materializes the ONE range exchange
    // per-partition offsets: ≤ numPartitions longs through the driver —
    // the bounded-collect class (IVF centroids, s12 rounds), not a data
    // collect. Offsets are the exclusive prefix sums in pid order.
    val counts = sorted.groupBy(col("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c) }.init.zip(counts)
      .map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = s.createDataFrame(offsets.toSeq).toDF("pid", "off")
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("spend").desc, col("o_custkey"))
    sorted
      .join(broadcast(offDf), "pid")
      .withColumn("rk", col("off") + row_number().over(w))
      .select(col("spend"),
        expr(s"CAST((rk - 1) * $tiles div $n AS INT)").as("tile"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).cast("double").as("total_spend"),
        min(col("spend")).cast("double").as("min_spend"),
        max(col("spend")).cast("double").as("max_spend"))
      .orderBy(col("tile"))
  }

  /** q72 — order-priority checking (the TPC-H Q4 shape): how many
    * orders of each priority, placed in a one-year window, had at
    * least one SLOW line — shipped more than `graceDays` after the
    * order date. (Q4 proper compares l_commitdate to l_receiptdate;
    * this schema carries neither, so the same EXISTS-per-order
    * semantics run on the shipdate-vs-orderdate lag, the only
    * fulfilment-latency signal the corpus has.)
    *
    * Scale posture: the EXISTS is a LEFT SEMI join on orderkey — the
    * probe side collapses each order to "has a slow line" without
    * materializing match multiplicity, so a 7-line order costs one
    * output row, not seven. The slow predicate references BOTH sides
    * (l_shipdate vs o_orderdate), so it rides the semi join as a
    * residual condition on the equi-key — one shuffle per side on
    * orderkey, no cartesian anywhere. The date filter prunes orders
    * BEFORE the join, and the final aggregate is five groups wide —
    * map-side combine makes it free. At 100 TB neither side is
    * broadcastable (the window keeps a constant fraction of orders);
    * the shuffle semi join on the natural key is the plan you'd want,
    * and at test SF AQE downgrades it to broadcast on its own.
    */
  def latePriorityOrders(s: SparkSession, dir: String,
      from: String = "1997-01-01", until: String = "1998-01-01",
      graceDays: Int = 30): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(from).cast("date") &&
        col("o_orderdate") < lit(until).cast("date"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $graceDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** q74 — incremental aggregate maintenance (materialized-view
    * refresh): the per-(returnflag, linestatus) totals are kept as
    * MERGEABLE PARTIALS (decimal sums + count), and a refresh merges
    * the base state with the new batch's partials instead of
    * rescanning history — `agg(base) ⊕ agg(delta) = agg(base ∪
    * delta)`, the property every 100 TB nightly-refresh pipeline
    * stands on. The registered query computes the answer THROUGH the
    * merge path (base partials ∪ delta partials → re-aggregate) while
    * the oracle recomputes from the full table — the hash equality IS
    * the mergeability proof, and it holds exactly because the partial
    * sums are DECIMAL (associative; a double partial would drift
    * against the full recompute at exactly the q58 boundary).
    * Derived averages divide the merged exact sums once at
    * presentation.
    *
    * Scale posture: the delta scan touches ONLY the new batch; the
    * base state is group-cardinality-sized (a few rows per group —
    * here 4 groups), so the refresh is O(delta + groups), never
    * O(history). Both partial aggregates map-side combine; the merge
    * shuffles `2 × groups` rows.
    */
  def incrementalAgg(s: SparkSession, dir: String, mod: Int = 10): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
        col("l_quantity").cast("decimal(18,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qty")).as("p_qty"), sum(col("price")).as("p_price"),
        count(lit(1)).as("p_n"))
    val base = partials(l.filter(pmod(col("l_orderkey"), lit(mod)) =!= 0))
    val delta = partials(l.filter(pmod(col("l_orderkey"), lit(mod)) === 0))
    base.union(delta)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("p_qty")).as("m_qty"), sum(col("p_price")).as("m_price"),
        sum(col("p_n")).as("n_items"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("m_qty").cast("double").as("sum_qty"),
        col("m_price").cast("double").as("sum_price"),
        col("n_items"),
        (col("m_qty").cast("double") / col("n_items").cast("double"))
          .as("avg_qty"),
        (col("m_price").cast("double") / col("n_items").cast("double"))
          .as("avg_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q75 — SCD-2 dimension versioning (slowly-changing dimension,
    * type 2): apply one change batch to the customer dimension and
    * emit the full version history — closed rows keep their old
    * attributes with `valid_to` = the change date, survivors stay
    * open, changed customers get a version-2 row. This is the MERGE
    * INTO shape every warehouse runs nightly; the reference has no
    * relational surface (family cited at `Sample.cs:1-264`, SURVEY
    * §2.3 absent category).
    *
    * The change batch here is DERIVED deterministically so the query
    * is self-contained and oracle-able: every 7th customer re-segments
    * to MACHINERY with a +100.00 balance adjustment; every 13th churns
    * (closed, no successor); a customer matching both churns. The
    * MERGE itself runs through [[scd2Merge]], the general relation
    * form.
    *
    * Exactness contract: all attributes ride unchanged except the one
    * double add (+100.0 — a single correctly-rounded IEEE op, engine-
    * identical); dates are fixed literals; versions are int literals.
    * Full hash oracle.
    */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir).select(col("c_custkey"),
      col("c_name"), col("c_mktsegment"), col("c_acctbal"))
    val changes = dim
      .filter(pmod(col("c_custkey"), lit(7)) === 0 &&
        pmod(col("c_custkey"), lit(13)) =!= 0)
      .select(col("c_custkey"), col("c_name"),
        lit("MACHINERY").as("c_mktsegment"),
        (col("c_acctbal") + lit(100.0)).as("c_acctbal"))
    val deletes = dim.filter(pmod(col("c_custkey"), lit(13)) === 0)
      .select(col("c_custkey"))
    scd2Merge(dim, changes, deletes, "2024-01-01", "2024-06-01")
      .orderBy(col("c_custkey"), col("version"))
  }

  /** q76 — point-in-time dimension reconstruction over the q75 SCD-2
    * history: for each probe date, keep the version rows whose
    * validity interval covers it (`valid_from <= d < valid_to`, open
    * end = ∞) and report the per-segment census — the "what did the
    * dimension look like on March 1st" query that is the entire point
    * of keeping SCD-2 history. Two probe dates straddle the change
    * date, so the result demonstrates both regimes.
    *
    * Exactness contract: the validity predicate is date compares on
    * literal dates; balances sum as exact DECIMAL(12,2) (2-dp values
    * cast exactly; the one +100.0 adjusted value re-rounds to the
    * same 2 dp on both engines) and close with a single double cast.
    * The ORACLE reconstructs each probe date's membership DIRECTLY
    * from the modulus rules — an independent derivation that must
    * agree with the history walk, which is itself the audit a
    * warehouse runs on its SCD pipelines.
    *
    * Scale posture: one scan of the history with the probe dates
    * exploded alongside (2 rows per version), one grouped aggregate —
    * no join; the history is the only input.
    */
  def asOfDimension(s: SparkSession, dir: String): DataFrame =
    scd2History(s, dir)
      .select(col("c_mktsegment"), col("c_acctbal"),
        col("valid_from"), col("valid_to"),
        explode(array(lit("2024-03-01").cast("date"),
          lit("2024-07-01").cast("date"))).as("as_of"))
      .filter(col("valid_from") <= col("as_of") &&
        (col("valid_to").isNull || col("valid_to") > col("as_of")))
      .groupBy(col("as_of"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double")
          .as("total_acctbal"))
      .orderBy(col("as_of"), col("c_mktsegment"))

  /** q90 — PER-EVENT point-in-time enrichment: every event joined to
    * the dimension attributes valid AT ITS OWN DATE (q76 answers "the
    * census on date D"; q90 answers "what did THIS event's customer
    * look like when the event happened" — the fact-table enrichment
    * every feature pipeline and revenue report runs against an SCD-2
    * dimension). Each event probes twice — at its own date (inside
    * version 1's validity) and shifted +8 months (inside version 2 /
    * after churn) — so one registered query exercises the full
    * interval algebra: v1 matches, v2 matches, and churned-customer
    * NULL extensions.
    *
    * Exactness: the validity predicate is date compares; attributes
    * ride unchanged (the one +100.0 is q75's single IEEE add);
    * add_months(Jan, 8) lands in September on both engines (no
    * month-end clamp divergence on this corpus's day range). Full
    * hash oracle.
    *
    * Scale posture: the history is dimension-sized → broadcast; the
    * interval predicate joins ≤1 version per (key, date) by SCD-2's
    * disjoint-validity invariant, so output = input rows exactly.
    * The same kernel [[enrichPointInTime]] runs unchanged on a
    * STREAM (stream-static left join — StreamingSpec asserts parity
    * row-for-row), which is the production shape: events arrive,
    * the dimension is the slowly-changing side.
    */
  def pointInTimeEnrich(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("d0"))
      .select(col("event_id"), col("user_id"),
        explode(array(
          struct(lit("asis").as("probe"), col("d0").as("event_date")),
          struct(lit("shifted").as("probe"),
            add_months(col("d0"), 8).as("event_date")))).as("p"))
      .select(col("event_id"), col("p.probe").as("probe"), col("user_id"),
        col("p.event_date").as("event_date"))
    enrichPointInTime(ev, scd2History(s, dir))
      .orderBy(col("event_id"), col("probe"))
  }

  /** The shared point-in-time enrichment kernel (batch q90 and its
    * streaming mirror — ONE implementation, streaming-ness comes from
    * the input): left-join each row's `event_date` into the SCD-2
    * validity interval (`valid_from <= d < valid_to`, open end = ∞)
    * on the business key, appending (mktsegment, acctbal,
    * dim_version); unmatched rows (pre-history or churned) null-
    * extend. `events` must carry `user_id` and `event_date`; all its
    * columns are preserved.
    */
  def enrichPointInTime(events: DataFrame, history: DataFrame): DataFrame = {
    val h = history.select(col("c_custkey"), col("c_mktsegment"),
      col("c_acctbal"), col("version"), col("valid_from"), col("valid_to"))
    events.join(h,
      events("user_id") === h("c_custkey") &&
        h("valid_from") <= events("event_date") &&
        (h("valid_to").isNull || h("valid_to") > events("event_date")),
      "left")
      .select(events.columns.map(events(_)) ++ Seq(
        h("c_mktsegment").as("mktsegment"),
        h("c_acctbal").as("acctbal"),
        h("version").as("dim_version")): _*)
  }

  /** The general SCD-2 merge: `base` is the open dimension snapshot
    * keyed by `c_custkey`, `changes` carries full new attribute rows
    * for updated keys, `deletes` lists churned keys. Output is the
    * version history: every base row as version 1 (closed at
    * `changeDate` iff its key is touched), every change row as an
    * open version 2.
    *
    * Scale posture: ONE left join of the dimension against the
    * (tiny, broadcastable) touched-key set plus a union with the
    * change rows — exactly how MERGE INTO executes on a cluster
    * (shuffle or broadcast on the business key, no full rewrite of
    * untouched partitions when the table format supports file-level
    * pruning). No window, no sort beyond presentation.
    */
  private[graft] def scd2Merge(base: DataFrame, changes: DataFrame,
      deletes: DataFrame, loadDate: String, changeDate: String): DataFrame = {
    val touched = changes.select(col("c_custkey"))
      .union(deletes).distinct()
      .withColumn("touched", lit(true))
    val v1 = base.join(touched, Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"),
        lit(1).as("version"),
        lit(loadDate).cast("date").as("valid_from"),
        when(col("touched"), lit(changeDate).cast("date"))
          .otherwise(lit(null).cast("date")).as("valid_to"),
        col("touched").isNull.as("is_current"))
    val v2 = changes.select(col("c_custkey"), col("c_name"),
      col("c_mktsegment"), col("c_acctbal"),
      lit(2).as("version"),
      lit(changeDate).cast("date").as("valid_from"),
      lit(null).cast("date").as("valid_to"),
      lit(true).as("is_current"))
    v1.unionByName(v2)
  }

  /** q82 — market-segment order stats through a SHUFFLED HASH join,
    * the fourth join strategy in the plan-pinned set (broadcast: q4;
    * sort-merge: q78; the window/as-of merges: q77). The 100 TB case
    * for it: customer⋈orders where BOTH sides are fact-sized — no
    * broadcast side exists — but after hashing on the key one side's
    * PER-PARTITION slice fits executor memory. A sort-merge join pays
    * two O(n log n) per-partition sorts; the shuffled hash join builds
    * a hash map over the smaller slice and streams the bigger one,
    * no sort at all (spec pins: ShuffledHashJoinExec present, zero
    * Sort anywhere below the aggregation). Spark never picks SHJ on
    * its own at test sizes (`spark.sql.join.preferSortMergeJoin`
    * defaults true and the planner wants statistics), so the choice
    * rides the explicit `hint("shuffle_hash")` — exactly how a
    * deployment pins it where table sizes are known.
    *
    * Numeric contract: o_totalprice folds as DECIMAL(18,4) on both
    * engines; final cast to double (q58 convention).
    */
  def shuffleHashSegments(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,4)").as("price"))
    c.hint("shuffle_hash").join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_buyers"),
        sum(col("price")).cast("double").as("total_price"))
      .orderBy(col("c_mktsegment"))
  }
}
