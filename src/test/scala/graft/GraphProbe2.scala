package graft
import org.apache.spark.sql.functions._
object GraphProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = R15Tools.benchSession()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f; spark.catalog.clearCache()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $label%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val e = graft.operators.Graph.tradeEdges(spark, dir)
    println("=== tradeEdges plan"); println(e.queryExecution.executedPlan.toString.take(3000))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), (col("o_custkey") * 2).as("cv"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("sv"))
    time("scan.orders")(noop(o))
    time("scan.lineitem")(noop(l))
    val j = o.join(l, col("o_orderkey") === col("l_orderkey")).select(col("cv").as("src"), col("sv").as("dst"))
    time("join.only")(noop(j))
    time("join.distinct")(noop(j.distinct()))
    time("tradeEdges.full")(noop(e))
    // one coreness round cost anatomy
    val ee = e.persist(); val deg = ee.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist(); deg.count()
    val h = deg.select(col("src").as("v"), col("deg").cast("int").as("h")).persist(); h.count()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src")).orderBy(col("h").desc)
    def round() = ee.join(broadcast(h), ee("dst") === h("v"))
      .groupBy(ee("src"), col("h")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .groupBy(col("src")).agg(max(least(col("h").cast("long"), col("cum"))).as("hl"))
    val t0 = System.nanoTime(); noop(round()); println(f"[probe] g5.round1 ${(System.nanoTime()-t0)/1e9}%.3f")
    val t1 = System.nanoTime(); noop(round()); println(f"[probe] g5.round2 ${(System.nanoTime()-t1)/1e9}%.3f")
    val agg = round().persist(); agg.count()
    val t2 = System.nanoTime(); val s = agg.agg(sum(col("hl"))).head().getLong(0); println(f"[probe] g5.sumaction ${(System.nanoTime()-t2)/1e9}%.3f s=$s")
    spark.stop()
  }
}
