package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.Shims

class IngestExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def parseTs(c: org.apache.spark.sql.Column) =
    Shims.column(graft.functions.ParseTs19(Shims.expression(c)))

  // every acceptance/rejection class the strict 19-byte layout defines,
  // plus the generator's own malformed-pickup sentinel
  private val battery = Seq(
    "2017-01-01 00:00:00", "2017-12-31 23:59:59", "2016-02-29 12:34:56",
    "1969-12-31 23:59:59", "1970-01-01 00:00:00", "0001-01-03 07:08:09",
    "2400-02-29 00:00:00", "2100-02-28 01:02:03",
    "2017-02-29 00:00:00", // invalid day (non-leap)
    "2100-02-29 00:00:00", // invalid day (century non-leap)
    "2017-00-10 00:00:00", "2017-13-01 00:00:00", // month range
    "2017-04-31 00:00:00", "2017-01-00 00:00:00", // day range
    "2017-01-01 24:00:00", "2017-01-01 00:60:00", "2017-01-01 00:00:60",
    "2017-01-01T00:00:00", "2017/01/01 00:00:00", // separators
    "2017-1-01 00:00:00", "2017-01-01 00:00:0", "2017-01-01 00:00:000",
    "not-a-date", "", " 2017-01-01 00:00:00", "2017-01-01 00:00:00 ",
    "2017-01-0a 00:00:00")

  test("ParseTs19 equals try_to_timestamp on the full battery (codegen path)") {
    val df = spark.createDataFrame(
      battery.map(Tuple1.apply)).toDF("s")
      .select(col("s"), parseTs(col("s")).as("got"),
        try_to_timestamp(col("s"), lit("yyyy-MM-dd HH:mm:ss")).as("want"))
    val bad = df.filter(!(col("got") <=> col("want"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
    // and the battery actually exercises both classes
    assert(df.filter(col("want").isNotNull).count() === 8)
  }

  test("ParseTs19 static helpers: UTC arithmetic equals java.time; zoned path agrees") {
    import org.apache.spark.unsafe.types.UTF8String
    val zone = java.time.ZoneId.of("America/New_York")
    for (s <- battery) {
      val u = UTF8String.fromString(s)
      val utc = graft.functions.ParseTs19.parseMicrosUtc(u)
      val zoned = graft.functions.ParseTs19.parseMicrosZoned(u, zone)
      assert((utc == Long.MinValue) === (zoned == Long.MinValue), s)
      if (utc != Long.MinValue) {
        val want = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          .atZone(java.time.ZoneOffset.UTC).toInstant
        assert(utc === want.getEpochSecond * 1000000L, s)
        val wantZ = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          .atZone(zone).toInstant
        assert(zoned === wantZ.getEpochSecond * 1000000L, s)
      }
    }
  }

  test("Opaque pins the parse projection: filters stay above, one parse per column") {
    // the r8 idiom rand(7) >= -1 was folded away by OptimizeRand, and a
    // non-deterministic barrier FILTER slides below the Project (the
    // push-through-Project rule checks field determinism, not condition
    // determinism). The Opaque projection field is the barrier that
    // holds: the speed filters must NOT be substituted into the scan
    // filter as re-derived parse chains.
    val dir = TaxiFixtures.writeDir().toString
    val w = graft.operators.TaxiSpeed.weightedAvgByDow(
      graft.sources.TaxiCsv.trips(spark, dir))
    val opt = w.queryExecution.optimizedPlan.toString
    assert(opt.contains("opaque"), opt.take(2000))
    val exec = w.queryExecution.executedPlan.toString
    // exactly one parse per timestamp column, zero formatter-based parses
    assert("parse_ts19".r.findAllIn(exec).length === 2, exec.take(3000))
    assert(!exec.contains("gettimestamp"), exec.take(3000))
    // the barrier costs nothing at runtime and the accept filter still
    // fuses into the scan below the projection — the result is unchanged
    // (weighted mode does not zero-fill: the fixture has 3 distinct days)
    assert(w.count() === 3)
  }

  test("Opaque is a runtime no-op: wrapped and unwrapped columns agree") {
    import spark.implicits._
    val df = Seq("2017-03-05 10:20:30", "not-a-date").toDF("s")
      .select(
        Shims.column(graft.functions.Opaque(
          Shims.expression(upper(col("s"))))).as("o"),
        upper(col("s")).as("p"))
    assert(df.filter(!(col("o") <=> col("p"))).count() === 0)
  }
}
