package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev scratch main (not shipped): instrument ONE cold GB-flagship run
  * to attribute the judge-observed first-run pathology (140-356 s cold
  * vs 7-10 s warm). Splits wall time into driver-side plan time vs
  * stage execution, and per-stage wall/cpu/gc/input — the discriminator
  * between "JIT/codegen warm-up in the scan stage" (stage wall >> cpu,
  * or cpu >> warm-run cpu) and "driver/Catalyst pathology" (gap before
  * first stage submission).
  *
  * Run: sbt 'Test/runMain graft.DevColdProbe [faithful|weighted]'
  */
object DevColdProbe {
  final case class StageRow(id: Int, name: String, submitted: Long,
      completed: Long, tasks: Int, runTimeMs: Long, cpuTimeMs: Long,
      gcTimeMs: Long, inputBytes: Long, records: Long)

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("faithful")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.concurrent.TrieMap[Int, StageRow]()
    val taskAgg = scala.collection.concurrent.TrieMap[Int, (Int, Long, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) taskAgg.updateWith(t.stageId) { prev =>
          val (n, rt, ct, gc, ib, rec) = prev.getOrElse((0, 0L, 0L, 0L, 0L, 0L))
          Some((n + 1, rt + m.executorRunTime, ct + m.executorCpuTime / 1000000,
            gc + m.jvmGCTime, ib + m.inputMetrics.bytesRead,
            rec + m.inputMetrics.recordsRead))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val (n, rt, ct, gc, ib, rec) = taskAgg.getOrElse(i.stageId, (0, 0L, 0L, 0L, 0L, 0L))
        stages(i.stageId) = StageRow(i.stageId, i.name.takeWhile(_ != '\n').take(60),
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
          n, rt, ct, gc, ib, rec)
      }
    })

    val glob = sys.env.getOrElse("GRAFT_PROBE_GLOB",
      "/root/repo/target/taxi_csv/sf0.1_gb3/*.csv")
    val preGlob = sys.env.get("GRAFT_PROBE_PREGLOB")
    def once(tag: String): Unit = {
      stages.clear(); taskAgg.clear()
      val t0 = System.nanoTime()
      val df =
        if (mode == "weighted")
          graft.operators.TaxiSpeed.weightedAvgByDow(
            graft.sources.TaxiCsv.trips(spark, glob))
        else
          graft.operators.TaxiSpeed.faithfulAvgByDowListed(spark, glob)
      // queryExecution.executedPlan forces analysis+optimization+planning
      val tPlanned = { df.queryExecution.executedPlan; System.nanoTime() }
      val out = graft.operators.TaxiSpeed.formatResult(df)
      val t1 = System.nanoTime()
      val wall = (t1 - t0) / 1e9
      val plan = (tPlanned - t0) / 1e9
      println(f"%n=== $tag $mode: wall $wall%.1f s (driver plan $plan%.1f s) ===")
      println(out.take(60))
      val rows = stages.values.toSeq.sortBy(_.submitted)
      val firstSub = rows.headOption.map(_.submitted).getOrElse(0L)
      println(f"  gap t0 -> first stage submitted: " +
        f"${(firstSub - (t0 / 1000000)) / 1000.0}%.1f s")
      rows.foreach { r =>
        println(f"  stage ${r.id}%3d ${r.name}%-60s wall ${(r.completed - r.submitted) / 1000.0}%7.1f s  " +
          f"tasks ${r.tasks}%3d  runT ${r.runTimeMs / 1000.0}%8.1f s  cpuT ${r.cpuTimeMs / 1000.0}%8.1f s  " +
          f"gc ${r.gcTimeMs / 1000.0}%6.1f s  in ${r.inputBytes / 1e9}%5.2f GB / ${r.records}%d rec")
      }
    }
    preGlob.foreach { g =>
      for (i <- 1 to sys.env.getOrElse("GRAFT_PROBE_PRERUNS", "2").toInt) {
        val t0 = System.nanoTime()
        graft.operators.TaxiSpeed.formatResult(
          graft.operators.TaxiSpeed.faithfulAvgByDowListed(spark, g))
        println(f"=== PRE-WARM $i on $g: ${(System.nanoTime() - t0) / 1e9}%.1f s ===")
      }
    }
    once("RUN1")
    once("RUN2")
    spark.stop()
  }
}
