package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonlCorpus

class JsonlCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("JSONL round-trip: every parquet doc survives with its exact text digest") {
    val got = JsonlCorpus.ingest(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getString(4))))
      .toMap
    val want = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("m"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("corrupt lines are present on disk but contribute no rows") {
    val glob = JsonlCorpus.ensure(spark, sfDir)
    val corrupt = new File(new File(glob).getParentFile, "zz_corrupt.json")
    assert(corrupt.exists(), "tolerance path not exercised: corrupt file missing")
    val lines = java.nio.file.Files.readAllLines(corrupt.toPath)
    assert(lines.size() === 4)
    // the truncated record carries doc_id 999999 — it must NOT survive
    val ids = JsonlCorpus.ingest(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(999999L))
    // raw permissive read sees the corrupt lines as null-keyed rows;
    // ingest's survivor filter is what removes them
    val raw = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("mode", "PERMISSIVE").json(glob)
    assert(raw.filter(col("doc_id").isNull).count() >= 3)
  }
}
