package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r15 scratch profiler (test scope, dev-only): stage-level timing of
  * the graph family's building blocks under the bench session config,
  * to attribute g1/g2/g3/g5 cost between edge-build, degree/adjacency
  * prep, and the per-round fixpoint work. Usage:
  *   sbt "Test/runMain graft.GraphProbe /root/testdata/sf0.1"
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = R15Tools.benchSession()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      spark.catalog.clearCache()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("tradeEdges")(noop(graft.operators.Graph.tradeEdges(spark, dir)))
    time("copurchaseEdges")(noop(graft.operators.Graph.copurchaseEdges(spark, dir)))
    time("copurchase.sets") {
      // the per-order sorted part sets alone (pre pair expansion)
      noop(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("ps"))
        .filter(size(col("ps")) >= 2))
    }
    time("g2.full")(noop(SparkEntry.queries("g2_triangles")(spark, dir)))
    time("g5.full")(noop(SparkEntry.queries("g5_coreness")(spark, dir)))
    time("g1.full")(noop(SparkEntry.queries("g1_pagerank")(spark, dir)))
    time("g9.full")(noop(SparkEntry.queries("g9_communities")(spark, dir)))
    time("g3.full")(noop(SparkEntry.queries("g3_clustering")(spark, dir)))
    time("g10.full")(noop(SparkEntry.queries("g10_shortest_paths")(spark, dir)))
    time("g7.full")(noop(SparkEntry.queries("g7_backbone_components")(spark, dir)))
    time("g8.full")(noop(SparkEntry.queries("g8_reachability")(spark, dir)))
    time("g6.full")(noop(SparkEntry.queries("g6_supplier_overlap")(spark, dir)))
    spark.stop()
  }
}
