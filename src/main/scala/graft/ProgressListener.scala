package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** O3 — progress/status reporting analog of the reference's
  * SetCustomStatus + Durable Functions status API
  * (Sample.cs:55,66,80,88,96; README.md:170-191): a
  * QueryExecutionListener recording per-query completion events that a
  * caller can poll, the Spark-idiomatic replacement for queue-based
  * status polling. (O4 — checkpoint/replay fault tolerance — is Spark
  * lineage + task retry, native.)
  */
class ProgressListener extends QueryExecutionListener {
  final case class Event(funcName: String, durationNs: Long,
      error: Option[String])

  private val events = new ConcurrentLinkedQueue[Event]()

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    events.add(Event(funcName, durationNs, None))

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    events.add(Event(funcName, 0L, Some(exception.getMessage)))

  /** Snapshot of recorded events (poll-style status retrieval). */
  def snapshot: Seq[Event] = {
    val it = events.iterator()
    val b = Seq.newBuilder[Event]
    while (it.hasNext) b += it.next()
    b.result()
  }
}

object ProgressListener {
  /** Register a fresh listener on the session and return it. */
  def attach(spark: SparkSession): ProgressListener = {
    val l = new ProgressListener
    spark.listenerManager.register(l)
    l
  }
}
