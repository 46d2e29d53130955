package graft

import graft.operators.Dedup

/** Dev probe: round-2 timings of the reworked d2/d6 against d3 at sf0.1,
  * plus row counts for a quick sanity check. Run:
  * sbt "Test/runMain graft.DevR2Probe".
  */
object DevR2Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    // warm pass then timed pass, cache cleared in between
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("d2_jaccard_pairs")(Dedup.jaccardPairs(spark, dir).count())
      time("d3_minhash_pairs")(Dedup.minhashLshPairs(spark, dir).count())
      time("d6_embedding_dedup")(Dedup.embeddingNearDupPairs(spark, dir).count())
    }
    val plan = Dedup.embeddingNearDupPairs(spark, dir)
      .queryExecution.executedPlan.toString
    println("d6 has BNLJ: " + plan.contains("BroadcastNestedLoopJoin"))
    spark.stop()
  }
}
object DevR2ProbeB {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("d2_jaccard_pairs")(graft.operators.Dedup.jaccardPairs(spark, dir).count())
      time("d3_minhash_pairs")(graft.operators.Dedup.minhashLshPairs(spark, dir).count())
      time("d7_chargram_pairs")(graft.operators.Dedup.charGramPairs(spark, dir).count())
    }
    spark.stop()
  }
}
