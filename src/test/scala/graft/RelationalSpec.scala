package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RelationalQueries

/** Plan-shape assertions: correctness is covered by the DuckDB oracle
  * gate (tools/check_oracle.py); these tests pin the *physical* plans we
  * want at scale — pushdown reaching the scan, bounded dims broadcast,
  * top-k as TakeOrderedAndProject instead of a global sort.
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter+project pushes predicates and prunes columns at the scan") {
    val p = plan(RelationalQueries.filterProject(spark, sfDir))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    // pruned read schema: no l_returnflag etc.
    assert(!p.contains("l_returnflag"), "scan reads unneeded columns")
  }

  test("star join broadcasts the bounded dimensions") {
    val p = plan(RelationalQueries.revenueByNation(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("global top-k plans as TakeOrderedAndProject (no full sort)") {
    val p = plan(RelationalQueries.topkOrders(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("semi/anti joins plan as join, not subquery re-scan") {
    assert(plan(RelationalQueries.semiJoin(spark, sfDir)).contains("LeftSemi"))
    assert(plan(RelationalQueries.antiJoin(spark, sfDir)).contains("LeftAnti"))
  }

  test("windows plan a single Window over partitioned sort") {
    val p = plan(RelationalQueries.windowRunning(spark, sfDir))
    assert(p.contains("Window"), p)
  }

  test("left-outer zero-fill aggregates the fact side before the join") {
    val df = RelationalQueries.leftOuterJoin(spark, sfDir)
    val p = plan(df)
    // HashAggregate must appear below the join in the plan tree: the
    // physical plan string lists join above its children.
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx, p)
  }
}
