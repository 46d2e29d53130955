package graft
import org.apache.spark.sql.functions._
object GraphProbe3 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = R15Tools.benchSession()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $label%-32s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val edges = graft.operators.Graph.tradeEdges(spark, dir)
    // A: current shape — persist as delivered
    val eA = edges.persist(); eA.count()
    // B: co-partitioned by src
    val eB = edges.repartition(col("src")).persist(); eB.count()
    println(s"[probe] partitions A=${eA.rdd.getNumPartitions} B=${eB.rdd.getNumPartitions}")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src")).orderBy(col("h").desc)
    def round(e: org.apache.spark.sql.DataFrame, h: org.apache.spark.sql.DataFrame) =
      e.join(broadcast(h), e("dst") === h("v"))
        .groupBy(e("src"), col("h")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(w))
        .groupBy(col("src")).agg(max(least(col("h").cast("long"), col("cum"))).as("hl"))
        .select(col("src").as("v"), col("hl").cast("int").as("h"))
    val degA = eA.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val hA = degA.select(col("src").as("v"), col("deg").cast("int").as("h")).persist(); hA.count()
    val degB = eB.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val hB = degB.select(col("src").as("v"), col("deg").cast("int").as("h")).persist(); hB.count()
    val exA = round(eA, hA).queryExecution.executedPlan.toString
    val exB = round(eB, hB).queryExecution.executedPlan.toString
    println(s"[probe] round exchanges A=${"Exchange".r.findAllIn(exA).length} B=${"Exchange".r.findAllIn(exB).length}")
    time("round.A (as delivered)")(noop(round(eA, hA)))
    time("round.B (src-partitioned)")(noop(round(eB, hB)))
    // pagerank iteration shape
    val degJA = eA.join(degA, "src").persist(); degJA.count()
    val degJB = eA.join(degA, "src").repartition(col("dst")).persist(); degJB.count()
    def prIter(edeg: org.apache.spark.sql.DataFrame, rank: org.apache.spark.sql.DataFrame) =
      edeg.join(broadcast(rank), edeg("src") === rank("v"))
        .select(col("dst"), expr("rank div deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("c"))
    val rank0A = degA.select(col("src").as("v"), lit(1000000L).as("rank")).persist(); rank0A.count()
    println(s"[probe] pr exchanges A=${"Exchange".r.findAllIn(prIter(degJA, rank0A).queryExecution.executedPlan.toString).length} B=${"Exchange".r.findAllIn(prIter(degJB, rank0A).queryExecution.executedPlan.toString).length}")
    time("prIter.A")(noop(prIter(degJA, rank0A)))
    time("prIter.B (dst-partitioned)")(noop(prIter(degJB, rank0A)))
    // g2 executed plan: count exchanges + check join strategies
    val g2 = SparkEntry.queries("g2_triangles")(spark, dir)
    noop(g2)
    spark.stop()
  }
}
