package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TaxiSpeed
import graft.sources.TaxiCsv

/** Dev probe: taxi-CSV ingest throughput on a synthetic ~300 MB corpus
  * (the reference's headline metric: its mappers manage ~1 MB/s,
  * 8 min / 3.2 GB end-to-end — BASELINE.md). Generates
  * reference-contract CSV (17 fields, header lines, some malformed)
  * with Spark itself, then times the full faithful pipeline.
  */
object DevProbeCsvThroughput {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val dir = Files.createTempDirectory(base, "taxi-big").toString

    // ~3M rows ≈ 300 MB of 17-field lines across 12 "monthly" files
    val nRows = 3000000L
    spark.range(nRows).select(
        concat(
          lit("2,2017-"),
          lpad(((col("id") % 12) + 1).cast("string"), 2, "0"),
          lit("-"),
          lpad(((col("id") % 27) + 1).cast("string"), 2, "0"),
          lit(" 10:00:00,2017-"),
          lpad(((col("id") % 12) + 1).cast("string"), 2, "0"),
          lit("-"),
          lpad(((col("id") % 27) + 1).cast("string"), 2, "0"),
          lit(" 10:"), lpad(((col("id") % 50) + 10).cast("string"), 2, "0"),
          lit(":00,1,"),
          format_number((col("id") % 200) / 10.0 + 0.1, 2),
          lit(",1,N,100,200,1,10.5,0.5,0.5,1.0,0.0,0.3,12.8")).as("value"))
      .repartition(12)
      .write.mode("overwrite").text(dir)

    val bytes = Files.walk(Paths.get(dir)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.toString.endsWith(".txt")).map(Files.size).sum
    println(f"CSV_BYTES=${bytes / 1e6}%.0f MB")

    // warm (JIT) on a slice, then time the full faithful pipeline
    TaxiSpeed.faithfulAvgByDow(TaxiCsv.trips(spark, dir).limit(50000)).count()
    val t0 = System.nanoTime()
    val res = TaxiSpeed.faithfulAvgByDowListed(spark, dir)
    val n = res.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"FAITHFUL_SECS=$secs%.2f MBPS=${bytes / 1e6 / secs}%.0f rows=$n")
    println("LISTED_VALUES=" + res.orderBy("day").collect().map(r => f"${r.getDouble(1)}%.6f").mkString(","))
    val t0b = System.nanoTime()
    TaxiSpeed.faithfulAvgByDow(TaxiCsv.trips(spark, dir)).count()
    val secsb = (System.nanoTime() - t0b) / 1e9
    println(f"FAITHFUL_DERIVED_SECS=$secsb%.2f MBPS=${bytes / 1e6 / secsb}%.0f")
    println("DERIVED_VALUES=" + TaxiSpeed.faithfulAvgByDow(TaxiCsv.trips(spark, dir))
      .orderBy("day").collect().map(r => f"${r.getDouble(1)}%.6f").mkString(","))
    val t1 = System.nanoTime()
    TaxiSpeed.weightedAvgByDow(TaxiCsv.trips(spark, dir)).count()
    val secs2 = (System.nanoTime() - t1) / 1e9
    println(f"WEIGHTED_SECS=$secs2%.2f MBPS=${bytes / 1e6 / secs2}%.0f")
    spark.stop()
  }
}
