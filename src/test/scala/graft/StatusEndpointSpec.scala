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

  test("unknown query name is 400; unknown run id is 404; failure surfaces") {
    val srv = StatusEndpoint.start(spark)
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      assert(http("POST", s"$base/runs?name=nope&dir=$sfDir")._1 === 400)
      assert(http("POST", s"$base/runs")._1 === 400)
      assert(http("GET", s"$base/runs/999")._1 === 404)
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
