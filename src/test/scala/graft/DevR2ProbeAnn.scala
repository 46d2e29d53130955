package graft

import graft.operators.Similarity

/** Dev probe: recall@5 sweeps for the ANN operators (s2 multi-table LSH,
  * s3 IVF) vs bruteForceTopK. Run: sbt "Test/runMain graft.DevR2ProbeAnn".
  */
object DevR2ProbeAnn {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      println(s"=== $dir ===")
      val exact = Similarity.bruteForceTopK(spark, dir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (b <- Seq(3, 4, 5); l <- Seq(4, 8, 12)) {
        val t0 = System.nanoTime()
        val ann = Similarity.lshTopK(spark, dir, nBits = b, nTables = l)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact intersect ann).size.toDouble / exact.size
        println(f"s2 lsh b=$b L=$l recall=$recall%.3f (${(System.nanoTime()-t0)/1e9}%.1f s)")
      }
      for (np <- Seq(4, 6, 8)) {
        val t0 = System.nanoTime()
        val ivf = Similarity.ivfTopK(spark, dir, nProbe = np)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (exact intersect ivf).size.toDouble / exact.size
        println(f"s3 ivf nProbe=$np recall=$recall%.3f (${(System.nanoTime()-t0)/1e9}%.1f s)")
      }
    }
    spark.stop()
  }
}
