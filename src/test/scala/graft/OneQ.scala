package graft
/** Throwaway: dump named queries' parquet for a quick oracle probe. */
object OneQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1); val names = args.drop(2)
    val spark = TestSpark.spark
    names.foreach { n =>
      SparkEntry.queries(n)(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$n")
      SparkEntry.oracleSql.get(n).foreach(sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/$n.sql"), sql))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
