package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Dev probe: materialization strategies for the shingle table. */
object DevR2ProbeCache {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      def strings = Tables.spread(
          Tables.documents(spark, dir).select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
        .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
      def longs = strings
        .select(col("doc_id"), transform(col("sh"), s => hash64(s)).as("sh"), col("sz"))
      time("cache strings")(strings.cache().count()); spark.catalog.clearCache()
      time("cache longs")(longs.cache().count()); spark.catalog.clearCache()
      time("localCheckpoint strings")(strings.localCheckpoint(true).count())
      time("localCheckpoint longs")(longs.localCheckpoint(true).count())
    }
    spark.stop()
  }
}
