package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalQueries3
import graft.plans.PlanChecks

/** Round-3 battery: semantic spot checks + the plan shapes each query
  * promises at scale (semi/anti joins for the subquery forms, broadcast
  * dims, no nested-loop degradation in the six-table star).
  */
class Relational3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("q41 EXISTS plans as a left-semi join, never exploding matches") {
    val df = RelationalQueries3.existsLateShip(spark, sfDir)
    val plan = PlanChecks.executedPlan(df)
    assert(plan.contains("LeftSemi"), plan)
    // every order counted at most once: total <= order count
    val total = df.agg(sum("order_count")).head().getLong(0)
    assert(total <= Tables.orders(spark, sfDir).count())
    assert(total > 0)
  }

  test("q42 NOT EXISTS plans as a left-anti join and complements EXISTS") {
    val df = RelationalQueries3.noBigOrderCustomers(spark, sfDir)
    assert(PlanChecks.executedPlan(df).contains("LeftAnti"))
    val kept = df.agg(sum("n_customers")).head().getLong(0)
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000.0)
    val withBig = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(kept + withBig === c.count())
  }

  test("q43 distribution accounts for every customer, including zero-order") {
    val df = RelationalQueries3.custOrderDistribution(spark, sfDir)
    val total = df.agg(sum("custdist")).head().getLong(0)
    assert(total === Tables.customer(spark, sfDir).count())
  }

  test("q44 promo share is a single agg pass over a broadcast dim join") {
    val df = RelationalQueries3.promoRevenueShare(spark, sfDir)
    assert(PlanChecks.hasBroadcastJoin(df))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getAs[Double]("promo_pct")
      assert(pct >= 0.0 && pct <= 100.0, r)
    }
  }

  test("q45 two-phase correlated avg matches a literal per-row check") {
    val df = RelationalQueries3.smallQtyRevenue(spark, sfDir)
    val n = df.head().getAs[Long]("n_items")
    // recompute with a window (different plan, same semantics)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val expected = Tables.lineitem(spark, sfDir)
      .withColumn("aq", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.5) * col("aq"))
      .count()
    assert(n === expected)
  }

  test("q46/q47 scan batteries are shuffle-free (ignoring the output sort)") {
    // exchanges only for the final orderBy — none between scan and project
    val q46 = RelationalQueries3.regexBattery(spark, sfDir)
    val q47 = RelationalQueries3.arrayBattery(spark, sfDir)
    assert(PlanChecks.exchangeCount(q46) <= 1)
    assert(PlanChecks.exchangeCount(q47) <= 1)
    assert(q46.count() === 500)
    assert(q47.filter(col("n_distinct") > col("n_words")).count() === 0)
  }

  test("q48 histogram shares sum to 100%") {
    val pcts = RelationalQueries3.priceHistogram(spark, sfDir)
      .select("pct_orders").collect().map(_.getDouble(0))
    assert(math.abs(pcts.sum - 100.0) < 1e-9)
  }

  test("q49 six-table star avoids nested-loop joins and returns rows") {
    val df = RelationalQueries3.localSupplierRevenue(spark, sfDir)
    assert(!PlanChecks.hasBroadcastNestedLoop(df))
    assert(!PlanChecks.executedPlan(df).contains("CartesianProduct"))
    assert(df.count() > 0)
  }

  test("q50 top supplier matches the sort-based formulation") {
    val df = RelationalQueries3.topSupplier(spark, sfDir)
    val top = df.collect()
    assert(top.nonEmpty)
    val bySort = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= expr("TIMESTAMP '2000-01-01 00:00:00'") &&
        col("l_shipdate") < expr("TIMESTAMP '2000-07-01 00:00:00'"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .orderBy(col("r").desc).limit(1).head().getLong(0)
    assert(top.map(_.getLong(0)).contains(bySort))
  }

  test("q54 trade volume: both directions covered, no nested loop, dims broadcast") {
    val df = RelationalQueries3.volumeShipping(spark, sfDir)
    assert(!PlanChecks.hasBroadcastNestedLoop(df))
    assert(PlanChecks.hasBroadcastJoin(df))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    // the fixture has trade in both directions across the window
    assert(dirs === Set(("NATION_13", "NATION_19"), ("NATION_19", "NATION_13")))
    assert(rows.forall(_.getDouble(3) > 0))
  }

  test("q56 returned revenue: heap-k plan, descending, at most 20 rows") {
    val df = RelationalQueries3.returnedRevenue(spark, sfDir)
    assert(PlanChecks.hasTakeOrdered(df))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getDouble(4))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q57 bracket revenue: broadcast probe, no fact shuffle before the agg") {
    val df = RelationalQueries3.bracketRevenue(spark, sfDir)
    assert(!PlanChecks.hasBroadcastNestedLoop(df))
    assert(PlanChecks.hasBroadcastJoin(df))
    val r = df.head()
    assert(r.getLong(1) > 0 && r.getDouble(0) > 0.0)
    // independently recompute via the complementary route: per-bracket
    // sums must add up to the OR'd total (brackets are disjoint on brand)
    val parts = Seq(("Brand#1", 15, 1.0, 11.0), ("Brand#2", 25, 10.0, 20.0),
      ("Brand#3", 35, 20.0, 30.0)).map { case (b, sz, lo, hi) =>
      Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir), col("p_partkey") === col("l_partkey"))
        .filter(col("p_brand") === b && col("p_size").between(1, sz) &&
          col("l_quantity").between(lo, hi))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .head().getDouble(0)
    }
    assert(math.abs(parts.sum - r.getDouble(0)) < 1e-6)
  }

  test("q55 market share is a genuine share: in [0,1], denominator checked") {
    val df = RelationalQueries3.marketShare(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val s = r.getDouble(1); s >= 0.0 && s <= 1.0
    })
    assert(!PlanChecks.hasBroadcastNestedLoop(df))
  }

  test("q59 best supplier per part: argmax agrees with a rank-window recompute") {
    import org.apache.spark.sql.expressions.Window
    val df = RelationalQueries3.bestSupplierPerPart(spark, sfDir)
    assert(PlanChecks.hasBroadcastJoin(df))
    assert(!PlanChecks.hasBroadcastNestedLoop(df))
    assert(PlanChecks.hasTakeOrdered(df), "presentation top-k is not a heap")
    val got = df.collect()
    assert(got.nonEmpty)
    // independent recompute through a rank window instead of max(struct)
    val junction = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "SMALL")
        .select(col("p_partkey").as("l_partkey")), "l_partkey")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val supp = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir)
        .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("s_nationkey")), "s_nationkey")
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    val want = junction
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l_partkey"), col("s_suppkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      val (pk, sk) = (r.getLong(0), r.getLong(3))
      assert(want.get(pk).contains(sk), s"part $pk: picked $sk, want ${want.get(pk)}")
    }
  }

  test("q58 profit: part and supplier dims broadcast; totals match a one-pass recompute") {
    val df = RelationalQueries3.profitByNationYear(spark, sfDir)
    assert(PlanChecks.hasBroadcastJoin(df))
    assert(!PlanChecks.hasBroadcastNestedLoop(df))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independent recompute through a different plan: one flat SQL join
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.part(spark, sfDir).createOrReplaceTempView("part")
    Tables.supplier(spark, sfDir).createOrReplaceTempView("supplier")
    Tables.nation(spark, sfDir).createOrReplaceTempView("nation")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    val total = spark.sql(
      """SELECT sum(l_extendedprice * (1.0 - l_discount)
        |    - 0.6 * p_retailprice * l_quantity) AS p
        |FROM lineitem, part, supplier, nation, orders
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND n_nationkey = s_nationkey AND o_orderkey = l_orderkey
        |  AND p_name LIKE '%red%'""".stripMargin).head().getDouble(0)
    val got = rows.map(_.getAs[Double]("profit")).sum
    assert(math.abs(got - total) < 1e-6 * math.max(1.0, math.abs(total)),
      s"$got != $total")
  }

  test("q67 big orders: HAVING filters before the joins; every row is genuinely big") {
    val df = RelationalQueries3.bigOrders(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every surviving order's total quantity really exceeds the threshold
    assert(rows.forall(_.getAs[Double]("sum_qty") > 250.0))
    // presentation order: totalprice descending, orderkey tie-break
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    // survivor set matches an independent HAVING recompute exactly
    val expect = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey").agg(sum("l_quantity").as("s"))
      .filter(col("s") > 250.0).count()
    assert(rows.length === math.min(100, expect.toInt))
    // no nested-loop degradation on either join
    assert(!PlanChecks.hasBroadcastNestedLoop(df))
  }

  test("q68 lost customers equals an exact BigDecimal driver reference") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.RelationalQueries3.lostCustomers(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // exact reference: BigDecimal threshold (bal·N > S), no division
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val buyers = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
      .select(col("o_custkey"))
      .distinct().collect().map(_.getLong(0)).toSet
    val nations = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val pos = custs.filter(_._3 > 0)
    val s = pos.map(_._3).sum; val n = pos.length
    val lost = custs.filter(c => c._3 * n > s && !buyers.contains(c._1))
    val want = lost.groupBy(c => nations(c._2)).toSeq
      .map { case (nat, cs) =>
        (nat, cs.length.toLong, cs.map(_._3).sum.toDouble) }
      .sortBy(_._1)
    assert(got.toSeq === want, s"got ${got.toSeq} want $want")
    assert(got.nonEmpty)
  }

  test("q69 supplier counts equal a driver recompute; blacklist and filters hold") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.RelationalQueries3.supplierCounts(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val sizes = Set(49, 14, 23, 45, 19, 3, 36, 9)
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3)))
      .filter { case (_, (b, t, sz)) =>
        b != "Brand#45" && !t.startsWith("PROMO") && sizes(sz) }
      .toMap
    val bad = Tables.supplier(spark, sfDir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (pk, sk) => parts.contains(pk) && !bad(sk) }
    val want = pairs.groupBy(p => parts(p._1))
      .map { case ((b, t, sz), ps) =>
        (b, t, sz, ps.map(_._2).distinct.length.toLong) }
      .toSeq.sortBy(x => (-x._4, x._1, x._2, x._3))
    assert(got.toSeq === want)
    assert(got.nonEmpty && got.forall(_._4 > 0))
  }

  test("q70 excess stock equals an exact BigDecimal driver reference") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.RelationalQueries3
      .excessStockSuppliers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val red = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith("red"))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val lines = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        year(col("l_shipdate")).as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .filter(l => red(l._1))
    val bySupp = lines.groupBy(l => (l._1, l._2)).toSeq
      .filter { case (_, ls) =>
        val avail = ls.length
        val demand = ls.filter(_._4 == 1998)
          .map(l => BigDecimal(l._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum
        BigDecimal(2 * avail) > demand
      }
      .groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val names = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = bySupp.toSeq.map { case (sk, n) => (sk, names(sk), n) }
      .sortBy(_._2)
    assert(got.toSeq === want)
    assert(got.nonEmpty)
  }

  test("q71 value tiles: equal-population cut, ordered spend bands, mass conserved") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.RelationalQueries3
      .customerValueTiles(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val nCust = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._1).toSeq === (0 until 10))
    assert(rows.map(_._2).sum === nCust)
    // ntile balance: populations differ by at most one
    val pops = rows.map(_._2)
    assert(pops.max - pops.min <= 1, s"unbalanced tiles: ${pops.toSeq}")
    // spend bands are descending and non-overlapping: each tile's max
    // is at most the previous tile's min
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(lo._5 <= hi._4 + 1e-9,
        s"tile ${lo._1} max ${lo._5} overlaps tile ${hi._1} min ${hi._4}")
    }
  }

  test("q72 late priorities: semi join with residual date predicate, exact recount") {
    val df = RelationalQueries3.latePriorityOrders(spark, sfDir)
    val plan = PlanChecks.executedPlan(df)
    assert(plan.contains("LeftSemi"), plan)
    assert(!PlanChecks.hasBroadcastNestedLoop(df))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent recount: max per-order ship lag via one aggregate
    val lag = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("max_ship"))
    val expect = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
        col("o_orderdate") < lit("1998-01-01").cast("date"))
      .join(lag, col("o_orderkey") === col("l_orderkey"))
      .filter(col("max_ship") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
    assert(got.values.sum > 0, "window/grace chosen so the answer is non-degenerate")
  }

  test("q74 incremental merge equals the direct full aggregate, bit for bit") {
    val got = RelationalQueries3.incrementalAgg(spark, sfDir).collect()
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect()
    assert(got.length === direct.length && got.nonEmpty)
    got.zip(direct).foreach { case (m, d) =>
      assert(m.getString(0) === d.getString(0) && m.getString(1) === d.getString(1))
      // decimal partials merge EXACTLY — require bitwise double equality
      assert(m.getDouble(2) === d.getDouble(2), s"sum_qty ${m.getString(0)}")
      assert(m.getDouble(3) === d.getDouble(3), s"sum_price ${m.getString(0)}")
      assert(m.getLong(4) === d.getLong(4))
      assert(m.getDouble(5) === m.getDouble(2) / m.getLong(4))
      assert(m.getDouble(6) === m.getDouble(3) / m.getLong(4))
    }
  }

  test("q75 SCD-2: versions partition correctly, closures and balances exact") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = RelationalQueries3.scd2History(spark, sfDir).collect()
    val nCust = graft.Tables.customer(spark, sfDir).count()
    val byKey = rows.groupBy(_.getLong(0))
    assert(byKey.size.toLong === nCust, "every customer appears")
    byKey.foreach { case (key, vs) =>
      val v1 = vs.find(_.getInt(4) == 1).get
      val changed = key % 7 == 0 && key % 13 != 0
      val deleted = key % 13 == 0
      // v1 closure iff touched; is_current is the complement
      assert(v1.isNullAt(6) === !(changed || deleted), s"key $key valid_to")
      assert(v1.getBoolean(7) === !(changed || deleted), s"key $key current")
      if (changed) {
        val v2 = vs.find(_.getInt(4) == 2).get
        assert(vs.length === 2)
        assert(v2.getString(2) === "MACHINERY")
        assert(v2.getDouble(3) === v1.getDouble(3) + 100.0)
        assert(v2.getBoolean(7) && v2.isNullAt(6))
        assert(v2.getDate(5).toString === "2024-06-01")
      } else assert(vs.length === 1, s"key $key: no v2 expected")
      assert(v1.getDate(5).toString === "2024-01-01")
    }
  }

  test("q76 as-of reconstruction agrees with a driver-side history walk") {
    val sfDir = "/root/testdata/sf0.001"
    val hist = RelationalQueries3.scd2History(spark, sfDir).collect()
    val got = RelationalQueries3.asOfDimension(spark, sfDir).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    for (d <- Seq("2024-03-01", "2024-07-01")) {
      val live = hist.filter { r =>
        r.getDate(5).toString <= d &&
          (r.isNullAt(6) || r.getDate(6).toString > d)
      }
      val bySeg = live.groupBy(_.getString(2))
      assert(got.keys.count(_._1 == d) === bySeg.size, s"segments at $d")
      bySeg.foreach { case (seg, rows) =>
        val (n, bal) = got((d, seg))
        assert(n === rows.length.toLong, s"$d/$seg count")
        // same DECIMAL(12,2) fold the operator uses
        val want = rows.map(r => BigDecimal(r.getDouble(3))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        assert(bal === want, s"$d/$seg balance")
      }
    }
    // March shows every customer; July drops exactly the churned keys
    val nCust = graft.Tables.customer(spark, sfDir).count()
    val nDeleted = graft.Tables.customer(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 13 === 0)
      .count()
    def totalAt(d: String): Long =
      got.collect { case ((dd, _), (n, _)) if dd == d => n }.sum
    assert(totalAt("2024-03-01") === nCust)
    assert(totalAt("2024-07-01") === nCust - nDeleted)
  }
}
