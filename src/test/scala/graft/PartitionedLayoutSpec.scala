package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PartitionedLayout
import graft.plans.PlanChecks

/** Date-partitioned layout (q79): answer equals the plain-parquet
  * recompute, and the scan proves directory-level pruning — the week
  * filter lands in PartitionFilters and only the 7 surviving
  * partitions' files are read.
  */
class PartitionedLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("q79 answer is layout-independent (equals the plain parquet recompute)") {
    val got = PartitionedLayout.weekSummary(spark, sfDir).collect()
    val want = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .filter(col("event_date").between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy(col("event_date"), col("event_type"))
      .collect()
    assert(got.length === want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("q79 plan: week filter is a PartitionFilter; only 7 of ~30 partitions read") {
    val df = PartitionedLayout.weekSummary(spark, sfDir)
    df.collect() // drive so scan metrics are populated
    val planStr = PlanChecks.executedPlan(df)
    assert(planStr.contains("PartitionFilters: [isnotnull(event_date"), planStr)
    val scans = PlanChecks.allNodes(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    assert(scans.size === 1, planStr)
    val filesRead = scans.head.metrics("numFiles").value
    // one file per partition dir (repartition-before-partitionBy) and
    // 7 surviving dates in the filtered week
    assert(filesRead === 7L, s"read $filesRead files:\n$planStr")
    // the table has ~30 date dirs on disk — most were never touched
    // (Hadoop FS: the warehouse path is a canonicalized file: URI)
    val root = new org.apache.hadoop.fs.Path(PartitionedLayout.ensure(spark, sfDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nDirs = fs.listStatus(root).count(_.getPath.getName.startsWith("event_date="))
    assert(nDirs > 20, s"expected ~30 partition dirs, found $nDirs")
  }

  test("q81 answer equals the inline-filter recompute (dim join ≡ date IN-list)") {
    val got = PartitionedLayout.campaignSummary(spark, sfDir).collect()
    val campaignDates = ((5 to 9) ++ (20 to 22)).map(d => f"2024-01-$d%02d")
    val want = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .filter(col("event_date").cast("string").isin(campaignDates: _*))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy(col("event_date"), col("event_type"))
      .collect()
    assert(got.length === want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("q81 plan: scan carries a dynamicpruningexpression partition filter") {
    val df = PartitionedLayout.campaignSummary(spark, sfDir)
    df.collect()
    val planStr = PlanChecks.executedPlan(df)
    assert(planStr.contains("dynamicpruning"),
      s"no dynamic partition pruning on the scan:\n$planStr")
    // and pruning actually happened: only the 8 campaign partitions read
    val scans = PlanChecks.allNodes(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    val factScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("graft_events_bydate"))).get
    assert(factScan.metrics("numFiles").value === 8L,
      s"fact scan read ${factScan.metrics("numFiles").value} files")
  }
}
