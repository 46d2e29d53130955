package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("media table carries an opaque binary payload column") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("payload").dataType.typeName === "binary")
    assert(m.count() === Tables.documents(spark, sfDir).count())
  }

  test("batched decode is deterministic and row-complete") {
    val a = Multimodal.mediaMeta(spark, sfDir).collect()
    val b = Multimodal.mediaMeta(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 500)
  }

  test("decode runs distributed across partitions, not on the driver") {
    val meta = Multimodal.extractMeta(
      Tables.spreadN(Multimodal.mediaTable(spark, sfDir)))
    assert(meta.rdd.getNumPartitions > 1)
  }

  test("stub metadata matches the payload bytes") {
    val row = Multimodal.mediaMeta(spark, sfDir)
      .filter(col("doc_id") === 0).head()
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).head().getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    assert(row.getAs[Int]("n_bytes") === bytes.length)
    assert(row.getAs[Int]("first_byte") === (bytes(0) & 0xff))
    assert(row.getAs[Long]("header_sum") ===
      bytes.take(16).map(_ & 0xff).map(_.toLong).sum)
  }
}
