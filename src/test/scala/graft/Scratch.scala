package graft
/** Throwaway scratch main for interactive probes. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import graft.operators.DataSkipping
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val path = DataSkipping.ensureLinear(spark, dir)
      val fpr = DataSkipping.bloomFalsePositiveRate(spark, path)
      println(f"bloom fpr @ $dir: $fpr%.4f")
    }
    spark.stop()
  }
}
