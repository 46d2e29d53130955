package graft

import java.nio.file.{Files, Paths}

import graft.operators.TaxiSpeed
import graft.sources.TaxiCsv

/** Dev-only smoke main: drives the taxi pipeline through the public API
  * on fixture CSVs, including hostile lines (quoted commas, non-int
  * probe field). Run: sbt "Test/runMain graft.DevProbe".
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = TaxiFixtures.writeDir().toString
    val trips = TaxiCsv.trips(spark, dir)
    println("TRIPS=" + trips.count())
    println("FAITHFUL:")
    TaxiSpeed.faithfulAvgByDow(trips).orderBy("day").show()
    println("WEIGHTED:")
    TaxiSpeed.weightedAvgByDow(trips).orderBy("day").show()
    // Hostile input: a quoted comma makes naive split see 18 fields →
    // dropped (the reference's naive Split(',') does the same); a non-int
    // field 0 with 17 fields → dropped by the int probe.
    Files.write(Paths.get(dir, "hostile.csv"),
      ("2,2017-01-02 10:00:00,2017-01-02 11:00:00,1,5.0,1,\"N,N\",1,1,1,1,1,1,1,1,1,1\n" +
       "notanint,2017-01-02 10:00:00,2017-01-02 11:00:00,1,5.0,1,N,1,1,1,1,1,1,1,1,1,1\n").getBytes("UTF-8"))
    println("AFTER_HOSTILE=" + TaxiCsv.trips(spark, dir).count())
    // R2/R3/O3 surfaces: formatted result, sink round-trip, listener
    val l = ProgressListener.attach(spark)
    val res = TaxiSpeed.faithfulAvgByDow(trips)
    println("FORMATTED=" + TaxiSpeed.formatResult(res))
    val out = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target", "test-tmp"), "probe").resolve("r").toString
    TaxiSpeed.writeResult(res, out)
    println("SINK_ROWS=" + spark.read.parquet(out).count())
    val deadline = System.currentTimeMillis() + 5000
    while (l.snapshot.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    println("LISTENER_EVENTS=" + l.snapshot.size)
    spark.stop()
  }
}
