package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

/** Small-files compaction (d33): content preserved exactly through two
  * physical rewrites, file counts actually shrink, and the range-
  * clustering invariant holds (each output file covers a contiguous
  * key slice).
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def partFiles(path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).map(_.getPath.getName).filter(_.startsWith("part-"))
  }

  test("content survives fragment → compact exactly (set equality on all columns)") {
    val got = Compaction.compactedContent(spark, sfDir).collect()
    val want = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("payload_md5"))
      .orderBy(col("doc_id")).collect()
    assert(got.length === want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("64 fragments in, few right-sized files out") {
    val nFrag = partFiles(Compaction.ensureFragmented(spark, sfDir)).length
    val nComp = partFiles(Compaction.ensureCompacted(spark, sfDir)).length
    assert(nFrag === Compaction.FragmentCount)
    assert(nComp < Compaction.FragmentCount / 4,
      s"compaction left $nComp files (from $nFrag)")
  }

  test("range clustering: across files, Σ distinct langs ≤ nLangs + nFiles − 1") {
    val compacted = spark.read.parquet(Compaction.ensureCompacted(spark, sfDir))
      .select(input_file_name().as("f"), col("lang"))
    val nFiles = compacted.select("f").distinct().count()
    val nLangs = compacted.select("lang").distinct().count()
    val sumPerFile = compacted.groupBy("f")
      .agg(countDistinct("lang").as("d"))
      .agg(sum("d")).collect()(0).getLong(0)
    // contiguous slices: only a boundary lang can appear in two
    // adjacent files, so the overlap is bounded by nFiles − 1
    assert(sumPerFile <= nLangs + nFiles - 1,
      s"sum=$sumPerFile langs=$nLangs files=$nFiles — output not range-clustered")
  }
}
