package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BucketedLayout
import graft.plans.PlanChecks

/** Bucketed layout (q78): answer equals the plain-parquet join, and the
  * PLAN is the one bucketing buys — a sort-merge join whose subtree has
  * zero shuffle and zero sort, both requirements satisfied by the
  * bucketed scans themselves.
  */
class BucketedLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("q78 answer is layout-independent (equals the plain parquet join)") {
    val got = BucketedLayout.revenueByPriority(spark, sfDir).collect()
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val want = o.join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(got.length === want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) === w.getString(0))
      assert(g.getLong(1) === w.getLong(1))
      // decimal folds are exact and associative → bit-equal doubles
      assert(g.getDouble(2) === w.getDouble(2), g.getString(0))
    }
  }

  test("q78 plan: SMJ with NO exchange below it; bucketed scans; narrow sorts only") {
    val df = BucketedLayout.revenueByPriority(spark, sfDir)
    df.collect() // drive so the AQE final plan is stitched
    val nodes = PlanChecks.allNodes(df.queryExecution.executedPlan)
    val smjs = nodes.collect { case j: SortMergeJoinExec => j }
    assert(smjs.size === 1, s"expected one SMJ:\n${PlanChecks.executedPlan(df)}")
    val below = PlanChecks.allNodes(smjs.head).filterNot(_ eq smjs.head)
    assert(!below.exists(_.isInstanceOf[ShuffleExchangeLike]),
      s"shuffle below the bucketed join:\n${smjs.head}")
    // SPARK-28595: the scan doesn't propagate sortBy ordering, so a
    // Sort per side survives — but it must be the NARROW (non-global)
    // kind: local CPU over co-located rows, no repartitioning
    val sorts = below.collect { case s: SortExec => s }
    assert(sorts.forall(!_.global), s"global sort below the bucketed join:\n${smjs.head}")
    // both scans really are bucketed reads, all buckets selected
    val planStr = PlanChecks.executedPlan(df)
    assert(planStr.contains("Bucketed: true"), planStr)
    // the only shuffles are ABOVE the join: the 5-value priority agg
    // and the 5-row presentation orderBy — nothing fact-sized moves
    val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 2, s"${shuffles.size} shuffles:\n$planStr")
  }

  test("one file per bucket (repartition-before-bucketBy invariant)") {
    val (oT, lT) = BucketedLayout.ensure(spark, sfDir)
    for (t <- Seq(oT, lT)) {
      val loc = spark.sql(s"DESCRIBE FORMATTED $t").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      val files = new java.io.File(new java.net.URI(loc))
        .listFiles().filter(_.getName.startsWith("part-"))
      // bucket id is encoded as the _00000 suffix before the uuid
      val byBucket = files.groupBy(_.getName.split("_")(1).take(5))
      assert(byBucket.size === BucketedLayout.NumBuckets, t)
      assert(byBucket.values.forall(_.length == 1),
        s"$t multi-file buckets: ${byBucket.view.mapValues(_.length).toMap}")
    }
  }
}
