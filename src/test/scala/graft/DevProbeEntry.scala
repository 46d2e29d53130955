package graft

/** Dev probe: drive the flagship entry() the way the driver smoke does. */
object DevProbeEntry {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val df = SparkEntry.entry(spark)
    df.show()
    println("ENTRY_ROWS=" + df.count())
    spark.stop()
  }
}
