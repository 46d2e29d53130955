package graft

/** Scratch timing main (test scope): time named SparkEntry queries on a
  * data dir, full execution through the noop sink, N reps each, min
  * reported. Usage:
  *   sbt "Test/runMain graft.TimeQ /root/testdata/sf0.1 3 s4_knn_join d6_embedding_dedup"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = TestSpark.spark
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // one untimed warm run per query for codegen/C2
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $n min=${ts.min}%.3f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
