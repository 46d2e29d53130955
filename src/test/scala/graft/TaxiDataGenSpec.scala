package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{TaxiCsv, TaxiDataGen}
import graft.operators.TaxiSpeed

/** The registered end-to-end taxi pipeline: corpus generation contract
  * (12 monthly files, one header-only, every FIXTURES.md §A edge line)
  * and the S2→R1 query shapes over it.
  */
class TaxiDataGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val dir: File = {
    val d = Files.createTempDirectory("graft_taxigen").toFile
    d.deleteOnExit()
    TaxiDataGen.generate(0L until 600L, d)
    d
  }
  lazy val glob: String = new File(dir, "*.csv").getAbsolutePath

  test("generates 12 monthly files; month 12 is header-only") {
    val files = TaxiCsv.listFiles(spark, glob)
    assert(files.size === 12)
    assert(files.forall(_.contains("yellow_tripdata_2017-")))
    val dec = new String(Files.readAllBytes(
      new File(dir, "yellow_tripdata_2017-12.csv").toPath), "UTF-8")
    assert(dec.trim === TaxiDataGen.Header)
  }

  test("accept-filter drops exactly the header + edge lines") {
    // per data file: 1 header + 5 edge lines, of which the bad-timestamp
    // line (17 fields, int probe) IS accepted; month 12: header only
    val accepted = TaxiCsv.acceptedLines(spark, glob)
    val perFile = accepted.groupBy(col("file")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!perFile.keys.exists(_.contains("2017-12")), "header-only file has no accepted rows")
    val nDataKept = (0L until 600L).count(id => math.floorMod(id, 12) != 11)
    assert(accepted.count() === nDataKept + 11 /* bad-ts line per data file */)
  }

  test("speed filters: zero-duration and zero-distance dropped, negative kept") {
    val sp = TaxiSpeed.withSpeed(TaxiCsv.trips(spark, glob))
    val n = sp.count()
    assert(n > 0)
    // ids with %101==0 (zero duration), %89==0 (zero distance) and the
    // bad-ts edge line are gone; %97==0 negatives survive
    assert(sp.filter(col("speed_mph") < 0).count() > 0, "negative speeds must be kept")
    assert(sp.filter(isnan(col("speed_mph"))).count() === 0)
  }

  test("faithful mode: 7 dense days, header-only file dilutes the mean") {
    val faithful = TaxiSpeed.faithfulAvgByDowListed(spark, glob).orderBy("day")
    val rows = faithful.collect()
    assert(rows.map(_.getInt(0)).toSeq === (0 to 6))
    // recompute independently: per-(file,day) means zero-filled over the
    // 12-file listing × 7 days, then unweighted mean per day
    val kept = TaxiSpeed.withSpeed(TaxiCsv.trips(spark, glob))
      .select(col("file"), col("day"), col("speed_mph"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val files = TaxiCsv.listFiles(spark, glob)
    val expected = (0 to 6).map { d =>
      val perFile = files.map { f =>
        val v = kept.filter(t => t._1 == f && t._2 == d).map(_._3)
        if (v.isEmpty) 0.0 else v.sum / v.length
      }
      d -> perFile.sum / files.size
    }.toMap
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - expected(r.getInt(0))) < 1e-9,
        s"day ${r.getInt(0)}")
    }
  }

  test("weighted mode differs from faithful (unequal file sizes + zero file)") {
    val f = TaxiSpeed.faithfulAvgByDowListed(spark, glob)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val w = TaxiSpeed.weightedAvgByDow(TaxiCsv.trips(spark, glob))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // the header-only file's zero vector pulls every faithful mean toward 0
    assert((0 to 6).exists(d => math.abs(f(d) - w.getOrElse(d, 0.0)) > 1e-9))
  }

  test("ensure() is idempotent: stamp short-circuits regeneration") {
    val glob1 = TaxiDataGen.ensure(spark, "/root/testdata/sf0.001")
    val f = new File(new File(glob1).getParentFile, "yellow_tripdata_2017-01.csv")
    val mtime = f.lastModified()
    val glob2 = TaxiDataGen.ensure(spark, "/root/testdata/sf0.001")
    assert(glob1 === glob2)
    assert(f.lastModified() === mtime, "second ensure() must not rewrite files")
  }
}
