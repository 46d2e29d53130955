package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{RelationalQueries, Similarity}
import graft.plans.PlanChecks

class PlanChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("PlanChecks observes the plan shapes the engine promises") {
    assert(PlanChecks.hasPushedFilter(
      RelationalQueries.filterProject(spark, sfDir), "GreaterThan(l_quantity"))
    assert(PlanChecks.hasBroadcastJoin(
      RelationalQueries.revenueByNation(spark, sfDir)))
    assert(PlanChecks.hasTakeOrdered(
      RelationalQueries.topkOrders(spark, sfDir)))
    assert(PlanChecks.hasWindowGroupLimit(
      Similarity.bruteForceTopK(spark, sfDir)))
    assert(PlanChecks.prunesColumn(
      RelationalQueries.filterProject(spark, sfDir), "l_returnflag"))
    assert(PlanChecks.wholeStageCodegenSpans(
      RelationalQueries.filterProject(spark, sfDir)) >= 1)
    assert(PlanChecks.exchangeCount(
      RelationalQueries.topkOrders(spark, sfDir)) === 0)
  }
}
