package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CowErasure

/** Round-15 operators: q94 vacuum/retention on the copy-on-write
  * store — the q91+q94 composition proving right-to-be-forgotten ends
  * with the deleted rows' BYTES physically gone from storage, plus
  * the reader-safety and idempotence contracts.
  */
class Round15OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  private def tmpTable(): String = {
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "cowvacuum").toString
  }

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("q91+q94 composed: vacuum removes the deleted doc_ids' bytes; retained reader survives; expired version fails cleanly") {
    val path = tmpTable()
    val (mod, rem) = (50, 7)
    CowErasure.publishBase(spark, sfDir, path)
    CowErasure.eraseCow(spark, sfDir, path, mod, rem)
    val f = fs(path)

    // pre-vacuum: the deleted rows' bytes are STILL on disk in the
    // superseded v=1 files of rewritten partitions (time travel to v1
    // can read them — that is exactly what q94 must end)
    val affected = spark.read.parquet(s"$path/manifest_v2")
      .filter(col("owner_version") === 2)
      .select(col("source")).collect().map(_.getString(0))
    assert(affected.nonEmpty)
    affected.foreach { src =>
      assert(f.exists(new org.apache.hadoop.fs.Path(
        s"$path/v=1/source=$src")), s"precondition: v1 bytes for $src")
    }
    val v1DeletedRows = CowErasure.readTableAt(spark, path, 1)
      .filter(pmod(col("doc_id"), lit(mod)) === rem).count()
    assert(v1DeletedRows > 0, "precondition: v1 still serves deleted rows")

    // a reader of the RETAINED head, opened BEFORE the vacuum
    val headReader = CowErasure.readTable(spark, path)
    val preVacuumCount = headReader.count()

    val (expired, removed) = CowErasure.vacuum(spark, path, retainFrom = 2)
    assert(expired == 1, "manifest_v1 expired")
    assert(removed == affected.length,
      "exactly the rewritten partitions' superseded dirs removed")

    // THE BYTES ARE GONE: every affected partition's v=1 directory no
    // longer exists, and NO parquet file anywhere under the store
    // contains a deleted doc_id
    affected.foreach { src =>
      assert(!f.exists(new org.apache.hadoop.fs.Path(
        s"$path/v=1/source=$src")), s"v1 bytes for $src must be gone")
    }
    val remaining = {
      val it = f.listFiles(new org.apache.hadoop.fs.Path(path), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val p = it.next().getPath.toString
        if (p.endsWith(".parquet") && !p.contains("manifest_v")) b += p
      }
      b.result()
    }
    assert(remaining.nonEmpty)
    val leakedDeleted = spark.read.parquet(remaining: _*)
      .filter(pmod(col("doc_id"), lit(mod)) === rem).count()
    assert(leakedDeleted == 0,
      s"$leakedDeleted deleted rows still physically present")

    // unaffected partitions' ORIGINAL files are untouched (served
    // from v=1 as before)
    val unaffected = spark.read.parquet(s"$path/manifest_v2")
      .filter(col("owner_version") === 1)
      .select(col("source")).collect().map(_.getString(0))
    unaffected.foreach { src =>
      assert(f.exists(new org.apache.hadoop.fs.Path(
        s"$path/v=1/source=$src")), s"retained v1 bytes for $src")
    }

    // reader safety: the pre-vacuum head reader still collects — all
    // its files are referenced by the retained manifest
    assert(headReader.count() == preVacuumCount)
    // time travel to the expired version fails CLEANLY at manifest
    // resolution, never as a dangling file read
    val e = intercept[IllegalArgumentException] {
      CowErasure.readTableAt(spark, path, 1)
    }
    assert(e.getMessage.contains("expired") ||
      e.getMessage.contains("not published"))

    // idempotence: a second vacuum finds nothing
    assert(CowErasure.vacuum(spark, path, retainFrom = 2) == ((0, 0)))

    // crash window between expire and orphan removal: simulate by
    // re-planting an unreferenced orphan dir — invisible to readers,
    // and the re-run removes it
    val orphan = new org.apache.hadoop.fs.Path(s"$path/v=1/source=${affected.head}")
    f.mkdirs(orphan)
    assert(CowErasure.vacuum(spark, path, retainFrom = 2) == ((0, 1)))
    assert(!f.exists(orphan))
  }

  test("q94 registered query: witness column matches the manifest owners at sf0.001") {
    val got = CowErasure.vacuumedSummary(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getBoolean(4) == (r.getInt(1) == 1),
        s"source ${r.getString(0)}: v1_files_present must equal owner==1")
    }
    // both owners occur at this SF (the vacuum actually had work)
    assert(got.map(_.getInt(1)).toSet == Set(1, 2))
  }
}
