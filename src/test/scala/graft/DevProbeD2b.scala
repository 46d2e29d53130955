package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Dev probe: d2 on a local[32] session (mirrors Bench), cold + warm. */
object DevProbeD2b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    time("warm sf0.001")(Dedup.jaccardPairs(spark, "/root/testdata/sf0.001").count())
    time("d2 sf0.1 first")(Dedup.jaccardPairs(spark, "/root/testdata/sf0.1").count())
    time("d2 sf0.1 second")(Dedup.jaccardPairs(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
