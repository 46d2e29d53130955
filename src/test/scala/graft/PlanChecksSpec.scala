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

  test("faithful flagship and taxi pipeline scan their facts exactly once") {
    assert(PlanChecks.fileScanCount(
      SparkEntry.queries("events_speed_faithful")(spark, sfDir)) === 1)
    val glob = graft.sources.TaxiDataGen.ensure(spark, sfDir)
    assert(PlanChecks.fileScanCount(
      graft.operators.TaxiSpeed.faithfulAvgByDowListed(spark, glob)) === 1)
  }

  test("containment dedup never plans a nested-loop or cartesian join") {
    val d8 = graft.operators.Dedup.containmentPairs(spark, sfDir)
    assert(!PlanChecks.hasBroadcastNestedLoop(d8))
    assert(!PlanChecks.executedPlan(d8).contains("CartesianProduct"))
  }

  test("q28 with no detected skew plans the plain join (no salt columns)") {
    val q28 = graft.operators.RelationalQueries2
      .hotKeySaltedJoinRevenue(spark, sfDir)
    assert(!PlanChecks.executedPlan(q28).contains("_salt"))
  }
}
