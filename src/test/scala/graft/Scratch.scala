package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc timing/plan scratch main (test scope only; not shipped). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    operators.Similarity.invalidateLshIndexes()
    val b0 = System.nanoTime()
    operators.Similarity.lshIndexFor(spark, dir)
    println(f"s2 build: ${(System.nanoTime() - b0) / 1e9}%.2f s")
    time("s2_query")(operators.Similarity.lshTopK(spark, dir))
    time("s1_exact")(operators.Similarity.bruteForceTopK(spark, dir))
    spark.stop()
  }
}
