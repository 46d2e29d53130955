package graft

import graft.operators.Dedup

/** Dev probe: warm timings of the two heaviest queries at sf0.1. */
object DevProbeHot {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    time("d2 cold")(Dedup.jaccardPairs(spark, dir).count())
    time("d2 warm")(Dedup.jaccardPairs(spark, dir).count())
    time("d6 cold")(Dedup.embeddingNearDupPairs(spark, dir).count())
    time("d6 warm")(Dedup.embeddingNearDupPairs(spark, dir).count())
    time("d3 warm")(Dedup.minhashLshPairs(spark, dir).count())
    spark.stop()
  }
}
