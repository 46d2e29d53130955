package graft
import org.apache.spark.sql.functions._
object DevProbeFmt {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = TaxiFixtures.writeDir().toString
    val raw = spark.read.text(dir).select(input_file_name()).distinct()
      .collect().map(_.getString(0)).sorted
    println("IFN=" + raw.head)
    println("LIST=" + graft.sources.TaxiCsv.listFiles(spark, dir).head)
    spark.stop()
  }
}
