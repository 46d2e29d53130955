package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("interval-blocked range join equals the naive theta join") {
    val blocked = TemporalJoins.rangeJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("double").as("sec"))
    val a = e.select(col("user_id"), col("sec").as("sec_a"))
    val b = e.select(col("user_id").as("uid_b"), col("sec").as("sec_b"))
    val naive = a.join(b, col("user_id") === col("uid_b") &&
        col("sec_b") > col("sec_a") && col("sec_b") - col("sec_a") <= 60)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(blocked === naive)
    assert(blocked.values.sum > 0)
  }

  test("as-of join: every matched click precedes its purchase") {
    val m = TemporalJoins.asOfJoin(spark, sfDir)
    assert(m.count() > 0)
    val bad = m.filter(col("last_click_ts").isNotNull &&
      col("last_click_ts") > col("purchase_ts")).count()
    assert(bad === 0)
    // at least one purchase has a prior click in this data
    assert(m.filter(col("last_click_ts").isNotNull).count() > 0)
  }
}
