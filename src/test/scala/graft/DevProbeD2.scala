package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._

/** Dev probe: stage-by-stage timing of the d2 prefix-filter jaccard
  * pipeline at sf0.1. Run: sbt "Test/runMain graft.DevProbeD2".
  */
object DevProbeD2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val t = 0.5
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.spread(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
      .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
    time("docs+shingles count")(docs.count())
    val exploded = docs.select(col("doc_id"), col("sz"), explode(col("sh")).as("g"))
    time("exploded")(println("  rows=" + exploded.count()))
    val freq = exploded.groupBy(col("g")).agg(count(lit(1)).as("df")).cache()
    time("freq")(println("  shingles=" + freq.count()))
    val ranked = exploded.join(freq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
      .withColumn("plen", col("sz") - ceil(lit(t) * col("sz")).cast("int") + 1)
      .filter(col("rk") <= col("plen"))
      .select(col("g"), col("doc_id"), col("sz"), col("rk")).cache()
    time("ranked/prefix")(println("  prefix rows=" + ranked.count()))
    val alpha = ceil(lit(t / (1 + t)) * (col("x.sz") + col("y.sz")))
    val candidates = ranked.as("x").join(ranked.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
          col("x.sz") >= lit(t) * col("y.sz") &&
          col("y.sz") >= lit(t) * col("x.sz") &&
          (lit(1) + least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk"))) >= alpha)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    time("candidates raw")(println("  cand=" + candidates.count()))
    val dedup = candidates.distinct().cache()
    time("candidates distinct")(println("  cand distinct=" + dedup.count()))
    spark.stop()
  }
}
