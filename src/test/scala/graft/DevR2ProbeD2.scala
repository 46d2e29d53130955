package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._

/** Dev probe: stage timings of the round-2 d2 pipeline at sf0.1.
  * Run: sbt "Test/runMain graft.DevR2ProbeD2".
  */
object DevR2ProbeD2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val t = 0.5
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val docs = Tables.spread(Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
        .withColumn("sz", size(col("sh"))).cache()
      time("docs+shingles")(docs.count())
      val exploded = docs.select(col("doc_id"), col("sz"), explode(col("sh")).as("g"))
      val freq = exploded.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 1)
      time("freq")(println("  df>1 shingles=" + freq.count()))
      val ranked = exploded.join(broadcast(freq), Seq("g"), "left")
        .withColumn("df", coalesce(col("df"), lit(1L)))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))))
        .withColumn("plen", col("sz") - ceil(lit(t) * col("sz")).cast("int") + 1)
        .filter(col("rk") <= col("plen") && col("df") > 1)
        .select(col("g"), col("doc_id"), col("sz"), col("rk"))
      time("ranked/prefix")(println("  prefix rows=" + ranked.count()))
      val alpha = ceil(lit(t / (1 + t)) * (col("x.sz") + col("y.sz")))
      val candidates = ranked.as("x").join(ranked.as("y"),
          col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id") &&
            col("x.sz") >= lit(t) * col("y.sz") &&
            col("y.sz") >= lit(t) * col("x.sz") &&
            (lit(1) + least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk"))) >= alpha)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      time("candidates")(println("  cand=" + candidates.count()))
      val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("sz").as("sz_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("sz").as("sz_b"))
      val verified = candidates.join(a, "doc_a").join(b, "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            (col("sz_a") + col("sz_b") - size(array_intersect(col("sh_a"), col("sh_b")))))
        .filter(col("jaccard") >= t)
      time("verify")(println("  pairs=" + verified.count()))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
