package graft

import java.net.{HttpURLConnection, URL}

import org.scalatest.funsuite.AnyFunSuite

/** The reference's submit + poll client contract (`Sample.cs:22-39`,
  * README.md:170-191), driven over real loopback HTTP: submit returns
  * 202 + a status URI, polling observes the run to Completed with the
  * query's rows as output, unknown names 400, unknown ids 404.
  */
class StatusEndpointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def http(method: String, url: String): (Int, String) = {
    val conn = new URL(url).openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val body = new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  test("submit returns 202 + status URI; poll reaches Completed with the rows") {
    val srv = StatusEndpoint.start(spark)
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      val (code, body) = http("POST",
        s"$base/runs?name=q2_filter_project&dir=$sfDir")
      assert(code === 202)
      val uri = """"statusQueryGetUri":"([^"]+)"""".r
        .findFirstMatchIn(body).get.group(1)

      var status = ""
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      var last = ""
      while (!status.matches("Completed|Failed") &&
          System.nanoTime() < deadline) {
        val (c, b) = http("GET", s"$base$uri")
        assert(c === 200)
        last = b
        status = """"runtimeStatus":"(\w+)"""".r
          .findFirstMatchIn(b).get.group(1)
        if (!status.matches("Completed|Failed")) Thread.sleep(200)
      }
      assert(status === "Completed", last)
      // output holds the query's own rows
      val want = SparkEntry.queries("q2_filter_project")(spark, sfDir)
        .count().toInt
      val gotRows = """"l_orderkey"""".r.findAllIn(last).size
      assert(gotRows === want, s"expected $want rows in output")
    } finally srv.stop()
  }

  test("status document carries input echo, timestamps, and customStatus stage transitions") {
    val srv = StatusEndpoint.start(spark)
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      val (code, body) = http("POST",
        s"$base/runs?name=q2_filter_project&dir=$sfDir")
      assert(code === 202)
      // the 202 body carries the reference's management-URL pair
      assert(body.contains(""""terminatePostUri":"""), body)
      val id = """"id":"(\d+)"""".r.findFirstMatchIn(body).get.group(1)
      var doc = ""
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!doc.contains(""""runtimeStatus":"Completed"""") &&
          System.nanoTime() < deadline) {
        doc = http("GET", s"$base/runs/$id")._2
        if (!doc.contains("Completed")) Thread.sleep(100)
      }
      // README.md:176-189 document shape: name, instanceId, echoed
      // input, customStatus, created/lastUpdated timestamps
      assert(doc.contains(s""""instanceId":"$id""""), doc)
      assert(doc.contains(
        s""""input":{"name":"q2_filter_project","dir":"$sfDir"}"""), doc)
      assert(doc.contains(""""createdTime":""""), doc)
      assert(doc.contains(""""lastUpdatedTime":""""), doc)
      assert(doc.contains(""""customStatus":""""), doc)
      // the run narrated its stages (Sample.cs SetCustomStatus analog):
      // lifecycle posts from the run thread + at least one live
      // per-Spark-job detail from the listener (listener events are
      // async — poll for them past the terminal state)
      val run = srv.run(id).get
      val lDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!run.stageHistory.exists(_.startsWith("Executing Spark job ")) &&
          System.nanoTime() < lDeadline) Thread.sleep(100)
      val hist = run.stageHistory
      assert(hist.contains("Planning query"), hist)
      assert(hist.contains("Collecting output"), hist)
      assert(hist.exists(_.startsWith("Executing Spark job ")), hist)
    } finally srv.stop()
  }

  test("terminate cancels a running query's job group; status lands Terminated, not Failed") {
    // a deliberately slow query (injected — not part of the public
    // surface): 4 tasks sleeping 20 s each, interruptible
    val slow = Map("slow" -> ((s: org.apache.spark.sql.SparkSession,
        _: String) => {
      import s.implicits._
      s.range(0, 4, 1, 4).mapPartitions { it =>
        Thread.sleep(20000); it }.toDF("id")
    }))
    val srv = StatusEndpoint.start(spark, queries = slow)
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      val (code, body) = http("POST", s"$base/runs?name=slow&dir=x")
      assert(code === 202)
      val id = """"id":"(\d+)"""".r.findFirstMatchIn(body).get.group(1)
      // wait until the run is actually Running
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (srv.run(id).get.state != StatusEndpoint.Running &&
          System.nanoTime() < deadline) Thread.sleep(50)
      val (tc, tdoc) = http("POST", s"$base/runs/$id/terminate")
      assert(tc === 200)
      assert(tdoc.contains(""""runtimeStatus":"Terminated""""), tdoc)
      // the cancelled thread dies with a SparkException — the
      // Terminated verdict must survive it (setState guard)
      Thread.sleep(1500)
      val after = http("GET", s"$base/runs/$id")._2
      assert(after.contains(""""runtimeStatus":"Terminated""""), after)
      assert(srv.run(id).get.stageHistory.contains("Terminate requested"))
      // terminating a terminal run is a 200 no-op (reference: POST to
      // terminatePostUri of a finished instance)
      assert(http("DELETE", s"$base/runs/$id")._1 === 200)
    } finally srv.stop()
  }

  test("admission control: 429 past maxConcurrent; terminal eviction bounds the registry") {
    val slow = Map(
      "slow" -> ((s: org.apache.spark.sql.SparkSession, _: String) => {
        import s.implicits._
        s.range(0, 4, 1, 4).mapPartitions { it =>
          Thread.sleep(20000); it }.toDF("id")
      }),
      "quick" -> ((s: org.apache.spark.sql.SparkSession, _: String) => {
        import s.implicits._
        Seq(1).toDF("one")
      }))
    val srv = StatusEndpoint.start(spark, maxConcurrent = 1,
      retainTerminal = 2, queries = slow)
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      val (c1, b1) = http("POST", s"$base/runs?name=slow&dir=x")
      assert(c1 === 202)
      val id1 = """"id":"(\d+)"""".r.findFirstMatchIn(b1).get.group(1)
      // second submission while the first is in flight → 429
      assert(http("POST", s"$base/runs?name=quick&dir=x")._1 === 429)
      assert(http("POST", s"$base/runs/$id1/terminate")._1 === 200)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (srv.liveCount > 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      // capacity freed: submissions admitted again; run 4 quick ones
      // to completion and let eviction (retainTerminal = 2) drop the
      // oldest terminal documents
      for (_ <- 1 to 4) {
        val (c, b) = http("POST", s"$base/runs?name=quick&dir=x")
        assert(c === 202)
        val id = """"id":"(\d+)"""".r.findFirstMatchIn(b).get.group(1)
        while (!srv.run(id).exists(_.isTerminal) &&
            System.nanoTime() < deadline) Thread.sleep(50)
      }
      // one more POST triggers eviction of all but the 2 newest
      // terminal docs; the terminated run 1 is long gone
      val (c6, b6) = http("POST", s"$base/runs?name=quick&dir=x")
      assert(c6 === 202)
      assert(http("GET", s"$base/runs/$id1")._1 === 404)
      assert(srv.size <= 3, s"registry grew to ${srv.size}")
      val id6 = """"id":"(\d+)"""".r.findFirstMatchIn(b6).get.group(1)
      while (!srv.run(id6).exists(_.isTerminal) &&
          System.nanoTime() < deadline) Thread.sleep(50)
    } finally srv.stop()
  }

  test("unknown query name is 400; unknown run id is 404; failure surfaces") {
    val srv = StatusEndpoint.start(spark)
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      assert(http("POST", s"$base/runs?name=nope&dir=$sfDir")._1 === 400)
      assert(http("POST", s"$base/runs")._1 === 400)
      assert(http("GET", s"$base/runs/999")._1 === 404)
      // a 404 for an id containing JSON metacharacters must come back
      // escaped (valid JSON), same as the 400 path
      val (qc, qb) = http("GET", s"$base/runs/%22quoted%22")
      assert(qc === 404)
      assert(qb.contains("no run '\\\"quoted\\\"'"), qb)
      // a run against a missing table dir must land in Failed
      val (c, b) = http("POST",
        s"$base/runs?name=q2_filter_project&dir=/no/such/dir")
      assert(c === 202)
      val uri = """"statusQueryGetUri":"([^"]+)"""".r
        .findFirstMatchIn(b).get.group(1)
      var status = ""
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!status.matches("Completed|Failed") &&
          System.nanoTime() < deadline) {
        val (_, sb) = http("GET", s"$base$uri")
        status = """"runtimeStatus":"(\w+)"""".r
          .findFirstMatchIn(sb).get.group(1)
        if (!status.matches("Completed|Failed")) Thread.sleep(200)
      }
      assert(status === "Failed")
    } finally srv.stop()
  }
}
