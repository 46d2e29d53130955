package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Dev probe: isolate shingle-computation parallelism at local[32]. */
object DevProbeShingle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    def shingled(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
      .select(sum(size(col("sh"))).as("n"))
    time("warm tiny")(shingled(base.limit(100)).head().getLong(0))
    time("no spread")(shingled(base).head().getLong(0))
    time("spread 32")(shingled(Tables.spread(base, col("doc_id"))).head().getLong(0))
    val n1 = Tables.spread(base, col("doc_id")).rdd.getNumPartitions
    println(s"spread partitions: $n1")
    time("tokens only, spread")(
      Tables.spread(base, col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(sum(size(col("w"))).as("n")).head().getLong(0))
    spark.stop()
  }
}
