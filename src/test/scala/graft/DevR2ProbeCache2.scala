package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Dev probe: which column makes the shingle-table cache slow? */
object DevR2ProbeCache2 {
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
    val raw = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("cache raw text")(raw.cache().count()); spark.catalog.clearCache()
      val tok = raw.select(col("doc_id"), tokens(col("text")).as("w"))
      time("cache tokens")(tok.cache().count()); spark.catalog.clearCache()
      val tokSplit = raw.select(col("doc_id"), split(lower(col("text")), "\\s+").as("w"))
      time("cache split-only")(tokSplit.cache().count()); spark.catalog.clearCache()
      val sh = tok.select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
      time("cache shingles")(sh.cache().count()); spark.catalog.clearCache()
      val shNoDistinct = tok.select(col("doc_id"), transform(
        sequence(lit(0), size(col("w")) - 3),
        i => concat_ws(" ", element_at(col("w"), i + 1),
          element_at(col("w"), i + 2), element_at(col("w"), i + 3))).as("sh"))
      time("cache shingles-nodistinct")(shNoDistinct.cache().count()); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
object DevR2ProbeCache3 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val raw = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val tokNoSpread = raw.select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
        .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
      time("shingles+sz no spread")(tokNoSpread.cache().count()); spark.catalog.clearCache()
      val withSpread = Tables.spread(raw, col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
      time("shingles spread nosz")(withSpread.cache().count()); spark.catalog.clearCache()
      val both = Tables.spread(raw, col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
        .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
      time("shingles spread+sz")(both.cache().count()); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
