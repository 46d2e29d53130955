package graft
/** Throwaway scratch main for interactive probes. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    import graft.operators.MergeDml
    val feed = MergeDml.dmlChangeFeedCdf(spark, sfDir)
    val mvBatch = MergeDml.dmlMvStream(feed)
    mvBatch.orderBy("c_nationkey").show(5, false)
    val root = new java.io.File("target/graft_table/customer_dml")
    val path = root.listFiles().filter(_.isDirectory).map(_.getPath)
      .find(p => new java.io.File(s"$p/manifest_v1/_SUCCESS").exists).get
    def agg(v: Int) = MergeDml.readVersion(spark, path, v)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"),
        sum(col("c_acctbal")).cast("decimal(28,2)").as("m"))
    val zero = lit(0).cast("decimal(28,2)")
    agg(2).as("b").join(agg(1).as("a"), Seq("c_nationkey"), "full_outer")
      .select(col("c_nationkey"),
        (coalesce(col("b.n"), lit(0L)) - coalesce(col("a.n"), lit(0L)))
          .as("n_accounts_delta"),
        (coalesce(col("b.m"), zero) - coalesce(col("a.m"), zero))
          .cast("decimal(28,2)").as("balance_delta"))
      .orderBy("c_nationkey").show(5, false)
    spark.stop()
  }
}
