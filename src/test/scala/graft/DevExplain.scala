package graft
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val df = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), shinglesFromTokens(col("w"), 3).as("sh"))
    println(df.queryExecution.optimizedPlan.toString.take(2500))
    spark.stop()
  }
}
