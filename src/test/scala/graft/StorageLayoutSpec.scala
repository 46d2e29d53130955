package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout scale demos: partitioned writes with partition
  * pruning at the scan, and bucketed tables that join without a
  * shuffle — the two layout levers that matter most at 100 TB.
  */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def tmpDir(prefix: String): String = {
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, prefix).toString
  }

  test("partitionBy write + filter read prunes partitions at the scan") {
    val out = tmpDir("part") + "/events_by_type"
    Tables.events(spark, sfDir).write
      .partitionBy("event_type").mode("overwrite").parquet(out)
    val df = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // pruned read: only the click partition directory is touched
    assert(df.count() ===
      Tables.events(spark, sfDir).filter(col("event_type") === "click").count())
  }

  test("bucketed tables join without an exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sfDir).write
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_bkt")
      Tables.lineitem(spark, sfDir).write
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_bkt")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).count()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side: the only Exchange
      // allowed is the one feeding the final aggregation
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
