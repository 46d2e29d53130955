package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc timing/plan scratch main (test scope only; not shipped).
  * Current probe: the native as-of join vs the q35 window form on a
  * ×10 blow-up of sf0.1 events (disjoint user/event id spaces per
  * replica — same per-key density, 10× keys and rows).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 4).map { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // first run is warmup; min of the remaining three
      println(f"$name: min=${ts.tail.min}%.3f s " +
        f"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val x10 = "target/asof_x100"
    if (!new java.io.File(x10).isDirectory) {
      val e0 = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      (0 until 100).map(i => e0.select(
          (col("event_id") + lit(i * 100000000L)).as("event_id"),
          (col("user_id") + lit(i * 100000000L)).as("user_id"),
          col("ts"), col("event_type")))
        .reduce(_ unionAll _)
        .write.mode("overwrite").parquet(x10)
    }
    val e = spark.read.parquet(x10)
    println(s"x100 events rows: ${e.count()}")

    def native(): DataFrame = {
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      operators.TemporalJoins.asOfJoinNative(
          purchases, clicks, "user_id", "c_user", "ts", "c_ts")
        .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
          col("c_ts").as("last_click_ts"))
    }
    def windowForm(): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("last_click_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("last_click_ts"))
    }
    time("q77_native_x100")(native())
    time("q35_window_x100")(windowForm())
    spark.stop()
  }
}
