package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** S1 + O3 — the reference's HTTP query-submission + status-polling
  * surface (`Sample.cs:22-39` StartAsync: parse params, start the
  * orchestration, return 202 with a status URL; README.md:170-191: the
  * status document carries `runtimeStatus` and, once complete,
  * `output`), previously mapped to driver `main` + ProgressListener as
  * a non-goal. Closed here the same loopback-spec way as the http
  * ingest transport: a dependency-free JDK HttpServer exposing
  *
  *   POST /runs?name=<query>&dir=<tableDir>  → 202 Accepted,
  *        body + Location header carry `/runs/<id>` (the
  *        statusQueryGetUri analog); 400 on an unknown query name
  *        (the reference 404s a null `path` param the same way).
  *   GET  /runs/<id>  → `{"runtimeStatus":"Running"}` while the query
  *        executes, then `{"runtimeStatus":"Completed","output":[…]}`
  *        with the result rows (or `Failed` + error). 404 unknown id.
  *
  * Submission is asynchronous (the reference's orchestration start):
  * the query runs on a daemon thread against the shared session, the
  * poller observes Pending → Running → Completed/Failed — the exact
  * client contract of the reference's status API. Output rows are
  * capped (`maxRows`, default 1000) because a STATUS document is a
  * control-plane payload; large results belong in a sink (R3,
  * `TaxiSpeed.writeResult`), same division the reference makes by
  * writing its result blob separately (`Sample.cs:96-104`).
  *
  * Scale posture: the endpoint holds run metadata only (id → status +
  * capped rows); the work is ordinary Spark jobs on the session. Not a
  * multi-tenant gateway — a deployment fronts it with whatever auth
  * the platform provides, as the reference leans on Functions'
  * auth-level (`Sample.cs:24`).
  */
object StatusEndpoint {

  sealed trait State
  case object Pending extends State
  case object Running extends State
  final case class Completed(rowsJson: String) extends State
  final case class Failed(error: String) extends State

  final class Server private[StatusEndpoint] (
      server: HttpServer, runs: ConcurrentHashMap[String, State]) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
    private[graft] def state(id: String): Option[State] =
      Option(runs.get(id))
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** The status document for a run state (reference: runtimeStatus +
    * output, README.md:178-188). */
  private def statusJson(st: State): String = st match {
    case Pending => """{"runtimeStatus":"Pending"}"""
    case Running => """{"runtimeStatus":"Running"}"""
    case Completed(rows) =>
      s"""{"runtimeStatus":"Completed","output":$rows}"""
    case Failed(err) =>
      s"""{"runtimeStatus":"Failed","error":"${jsonEscape(err)}"}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
      headers: (String, String)*): Unit = {
    val bytes = body.getBytes("UTF-8")
    headers.foreach { case (k, v) => ex.getResponseHeaders.set(k, v) }
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  /** Start the endpoint on `port` (0 = ephemeral). */
  def start(spark: SparkSession, port: Int = 0,
      maxRows: Int = 1000): Server = {
    val runs = new ConcurrentHashMap[String, State]()
    val nextId = new AtomicLong(1L)
    val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", port), 0)

    server.createContext("/runs", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path) match {
        case ("POST", "/runs") =>
          val params = queryParams(ex)
          (params.get("name"), params.get("dir")) match {
            case (Some(name), Some(dir))
                if SparkEntry.queries.contains(name) =>
              val id = nextId.getAndIncrement().toString
              runs.put(id, Pending)
              val t = new Thread(() => {
                runs.put(id, Running)
                try {
                  val rows = SparkEntry.queries(name)(spark, dir)
                    .limit(maxRows).toJSON.collect()
                  runs.put(id, Completed(rows.mkString("[", ",", "]")))
                } catch { case e: Throwable =>
                  runs.put(id, Failed(
                    Option(e.getMessage).getOrElse(e.getClass.getName)))
                }
              }, s"graft-run-$id")
              t.setDaemon(true)
              t.start()
              respond(ex, 202,
                s"""{"id":"$id","statusQueryGetUri":"/runs/$id"}""",
                "Location" -> s"/runs/$id")
            case (Some(name), _) if !SparkEntry.queries.contains(name) =>
              respond(ex, 400,
                s"""{"error":"unknown query '${jsonEscape(name)}'"}""")
            case _ =>
              respond(ex, 400,
                """{"error":"required params: name, dir"}""")
          }
        case ("GET", p) if p.startsWith("/runs/") =>
          val id = p.stripPrefix("/runs/")
          Option(runs.get(id)) match {
            case Some(st) => respond(ex, 200, statusJson(st))
            case None =>
              respond(ex, 404, s"""{"error":"no run '$id'"}""")
          }
        case _ => respond(ex, 405, """{"error":"method not allowed"}""")
      }
    })
    server.start()
    new Server(server, runs)
  }
}
