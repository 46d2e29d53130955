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

  test("m4 resize: empty payload resizes to empty, NULL stays NULL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefgh"),        // normal: picks a,e → "ae"
      (2L, ""),                // empty: sequence guard must not fire
      (3L, null.asInstanceOf[String]), // NULL propagates
      (4L, "x")                // single byte: sequence(1,1,4) = [1]
    ).toDF("doc_id", "text")
    val out = Multimodal.resizeFrom(docs, stride = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    assert(out(1L) === 2)   // "ae"
    assert(out(2L) === 0)   // empty string, not a runtime error
    assert(out(3L) === -1)  // NULL in → NULL out (md5 too)
    assert(out(4L) === 1)   // "x"
    val nullRow = Multimodal.resizeFrom(docs, 4)
      .filter(col("doc_id") === 3).head()
    assert(nullRow.isNullAt(nullRow.fieldIndex("resized_md5")))
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
