package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: profile d11_decontaminate at sf0.1. */
object DevProbeD11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // Fresh construction per pass, like Bench.timeOnce: the operator's
    // internal cache() must be re-registered after clearCache.
    for (i <- 1 to 3) {
      val df = graft.operators.CorpusOps.decontaminate(spark, dir)
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"pass $i: rows=$n  ${(System.nanoTime() - t0) / 1e9}s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
