package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
object GraphProbe4 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = R15Tools.benchSession()
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      f
      val ts = (1 to reps).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $label%-34s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val edges = graft.operators.Graph.copurchaseEdges(spark, dir)
    val canon = edges.persist()
    val deg = canon.select(col("pa").as("v")).union(canon.select(col("pb").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d")).persist()
    deg.count()
    val lesser = struct(col("da"), col("pa")) < struct(col("db"), col("pb"))
    def oBase = canon
      .join(deg.select(col("v").as("pa"), col("d").as("da")), Seq("pa"))
      .join(deg.select(col("v").as("pb"), col("d").as("db")), Seq("pb"))
      .select(when(lesser, col("pa")).otherwise(col("pb")).as("src"),
        when(lesser, col("pb")).otherwise(col("pa")).as("dst"))
    // A: current (persist as built)
    val oA = oBase.persist(); oA.count()
    def trisA = {
      val adj = oA.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
      oA.join(adj.select(col("src"), col("nbrs").as("na")), Seq("src"))
        .join(adj.select(col("src").as("dst"), col("nbrs").as("nb")), Seq("dst"), "left")
        .select(size(array_intersect(col("na"), coalesce(col("nb"), array()))).as("k"))
        .agg(coalesce(sum(col("k")), lit(0)).cast("long").as("n_triangles"))
    }
    time("tris.A current")(noop(trisA))
    // B: src-partitioned o + broadcast adj
    val oB = oBase.repartition(col("src")).persist(); oB.count()
    def trisB = {
      val adj = oB.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
      oB.join(broadcast(adj.select(col("src"), col("nbrs").as("na"))), Seq("src"))
        .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nb"))), Seq("dst"), "left")
        .select(size(array_intersect(col("na"), coalesce(col("nb"), array()))).as("k"))
        .agg(coalesce(sum(col("k")), lit(0)).cast("long").as("n_triangles"))
    }
    time("tris.B bcast adj")(noop(trisB))
    // C: src-partitioned o, no hints (AQE decides)
    def trisC = {
      val adj = oB.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
      oB.join(adj.select(col("src"), col("nbrs").as("na")), Seq("src"))
        .join(adj.select(col("src").as("dst"), col("nbrs").as("nb")), Seq("dst"), "left")
        .select(size(array_intersect(col("na"), coalesce(col("nb"), array()))).as("k"))
        .agg(coalesce(sum(col("k")), lit(0)).cast("long").as("n_triangles"))
    }
    time("tris.C src-part, AQE")(noop(trisC))
    println("[probe] A=" + trisA.head.getLong(0) + " B=" + trisB.head.getLong(0) + " C=" + trisC.head.getLong(0))
    spark.stop()
  }
}
