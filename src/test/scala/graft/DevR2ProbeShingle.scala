package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Dev probe: where does the shingle-build time go at sf0.1? */
object DevR2ProbeShingle {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      val base = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      time("raw count")(base.count())
      val spreadDf = Tables.spread(base, col("doc_id"))
      time("spread count")(spreadDf.count())
      val tok = spreadDf.select(col("doc_id"), tokens(col("text")).as("w"))
      time("tokens agg")(tok.select(sum(size(col("w")))).head())
      val sh = tok.select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
      time("shingles agg")(sh.select(sum(size(col("sh")))).head())
      val full = sh.withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
      time("cache mat")(full.cache().count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
