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

  test("d12 curate scans the corpus once (cached), bounded shuffles") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.catalog.clearCache()
    try {
      val d12 = graft.operators.CorpusOps.curate(spark, sfDir)
      // drive THIS plan so the final adaptive shape (and the cache fill)
      // is what we inspect
      d12.queryExecution.executedPlan.execute().count()
      val ns = PlanChecks.allNodes(d12.queryExecution.executedPlan)
      // corpus scan + fp dedup shuffle live inside the cached relation,
      // materialized once — both consuming branches read the cache
      assert(ns.count(_.isInstanceOf[FileSourceScanExec]) === 0)
      assert(ns.count(_.isInstanceOf[InMemoryTableScanExec]) === 2)
      // remaining shuffles: (lang, score) percentile + presentation sort
      assert(ns.count(_.isInstanceOf[ShuffleExchangeLike]) === 2)
      // the dedup rank-1 filter planned two-phase inside the cached plan
      assert(PlanChecks.executedPlan(d12).contains("WindowGroupLimit"))
    } finally spark.catalog.clearCache()
  }

  test("r11 ops plan the shapes their scaladocs promise") {
    // t17: vocabulary head via distributed heap-R, never a full sort
    assert(PlanChecks.hasTakeOrdered(
      graft.operators.TextAnalysis.zipfFit(spark, sfDir)))
    // w7: first-purchase attribution is two-phase per-click top-1
    assert(PlanChecks.hasWindowGroupLimit(
      graft.streaming.EventsWindows.clickAttribution(spark, sfDir)))
    // t16: no nested-loop anywhere except the broadcast 1-row totals
    val t16 = graft.operators.TextAnalysis.bigramLogprob(spark, sfDir)
    try {
      assert(!PlanChecks.executedPlan(t16).contains("CartesianProduct"))
      // the three vocabulary joins hash-join (broadcast or shuffled),
      // never nested-loop over corpus-sized inputs: the only BNLJ
      // allowed is the single-row totals crossJoin
      import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
      val bnl = PlanChecks.allNodes(t16.queryExecution.executedPlan)
        .collect { case b: BroadcastNestedLoopJoinExec => b }
      assert(bnl.size <= 1, s"unexpected nested loops: ${bnl.size}")
    } finally spark.catalog.clearCache() // t16 caches its token arrays
  }

  test("q28 construction is side-effect-free and broadcasts the hot set") {
    // The r6 rewrite moved hot-key detection INSIDE the plan: building
    // the DataFrame must run zero Dataset actions (the old shape ran an
    // eager hot-set collect() at construction, charging plan-only
    // callers a cluster job). A QueryExecutionListener sees exactly
    // those actions — and, unlike a raw job counter, is blind to the
    // benign parquet schema-inference jobs `spark.read` schedules.
    // Listener events are posted async → drain the bus before asserting.
    val listener = ProgressListener.attach(spark)
    try {
      val q28 = graft.operators.RelationalQueries2
        .hotKeySaltedJoinRevenue(spark, sfDir)
      org.apache.spark.sql.graft.Shims.drainListenerBus(spark.sparkContext)
      assert(listener.snapshot.isEmpty,
        "constructing q28 must not execute any Dataset action")
      // The detected-hot-key set is tiny by construction → it must be
      // BROADCAST onto BOTH the fact and the dim side, never shuffled.
      // Check the join NODES' keys, not plan-string substrings — two
      // independent contains() would pass even if the _hk joins
      // shuffled while some unrelated join broadcast.
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      val hkBroadcasts = PlanChecks.allNodes(q28.queryExecution.executedPlan)
        .collect { case b: BroadcastHashJoinExec
          if (b.leftKeys ++ b.rightKeys)
            .exists(_.references.exists(_.name == "_hk")) => b }
      assert(hkBroadcasts.size === 2,
        "hot set must broadcast onto both the fact and the dim side")
    } finally spark.listenerManager.unregister(listener)
  }
}
