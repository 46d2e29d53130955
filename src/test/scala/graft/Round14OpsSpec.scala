package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CowErasure, Dedup, Graph}

/** r14 additions: bounded weighted SSSP (g10), URL-canonicalization
  * dedup (d37), partition-targeted copy-on-write erasure (q91) — each
  * checked against an independent driver-side recompute, plus the
  * physical-layout properties the COW erasure promises (untouched
  * partitions' files are byte-identical; an unpublished erasure is
  * invisible to readers).
  */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("g10 weighted SSSP census matches a driver-side Bellman-Ford") {
    val df = Graph.shortestPaths(spark, sfDir, maxHops = 4, seedMod = 500)
    val got = df.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // driver Bellman-Ford over the same cheapest-lane trade graph
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), (col("o_custkey") * 2).as("cv"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("sv"),
        col("l_quantity").cast("int").as("q"))
    val lanes = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("cv"), col("sv")).agg(min(col("q")).as("w")).collect()
      .flatMap { r =>
        val (c, s, w) = (r.getLong(0), r.getLong(1), r.getInt(2))
        Seq((c, s, w), (s, c, w))
      }
    val adj = lanes.groupBy(_._1)
      .map { case (k, v) => k -> v.map(e => (e._2, e._3)) }
    val seeds = Tables.customer(spark, sfDir)
      .filter(pmod(col("c_custkey"), lit(500)) === 0)
      .select(col("c_custkey") * 2).collect().map(_.getLong(0)).toSet
    var dist = seeds.map(_ -> 0).toMap
    for (_ <- 1 to 4) {
      val relaxed = dist.toSeq.flatMap { case (v, d) =>
        adj.getOrElse(v, Array.empty[(Long, Int)]).map { case (u, w) =>
          u -> (d + w)
        }
      }
      val cand = relaxed.groupBy(_._1).map { case (u, xs) =>
        u -> xs.map(_._2).min
      }
      dist = (dist.keySet ++ cand.keySet).map { v =>
        v -> math.min(dist.getOrElse(v, Int.MaxValue),
          cand.getOrElse(v, Int.MaxValue))
      }.toMap
    }
    val want = dist.groupBy(_._2).map { case (d, vs) =>
      d -> (vs.size.toLong,
        vs.keys.count(_ % 2 == 0).toLong, vs.keys.count(_ % 2 == 1).toLong)
    }
    assert(got === want)
    // seeds sit at distance 0; every non-seed distance is positive
    assert(got.contains(0))
    assert(got.keys.forall(_ >= 0))
  }

  test("d37 canonicalization collapses exactly the planted URL noise") {
    val df = Dedup.urlCanonicalDedup(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // driver-side recompute of the canonical form
    def canon(id: Long, source: String): String = {
      val raw = "https://" +
        (if (id % 3 == 0) source.toUpperCase else source) +
        ".example.com/articles/" + (id % 100) +
        (if (id % 2 == 0) "/" else "") +
        (id % 5 match {
          case 0 => "?utm_source=feed&b=2&a=1"
          case 1 => "?a=1&ref=home&b=2"
          case 2 => "?b=2&a=1"
          case _ => ""
        }) + (if (id % 7 == 0) "#section-2" else "")
      val noFrag = raw.replaceAll("#.*$", "")
      val m = "^(https?://[^/?]*)([^?]*)(\\?(.*))?$".r
        .findFirstMatchIn(noFrag).get
      val sh = m.group(1).toLowerCase
      val path = m.group(2).replaceAll("/+$", "")
      val q = Option(m.group(4)).getOrElse("")
      val kept = q.split("&").filter(p => p.nonEmpty &&
        !p.startsWith("utm_") && !p.startsWith("ref=")).sorted
      sh + path + (if (kept.isEmpty) "" else "?" + kept.mkString("&"))
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val groups = docs.groupBy { case (id, src) => canon(id, src) }
    val want = groups.map { case (cu, members) =>
      cu -> (members.map(_._1).min, members.length.toLong)
    }
    val gotMap = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotMap === want)
    // the planted noise really collapses: some group has > 1 member
    assert(rows.exists(_.getLong(2) > 1), "no URL variants collapsed")
    // and some member carried tracking noise
    assert(rows.map(_.getLong(3)).sum > 0)
  }

  test("d38 collapses word reorderings but never distinct multisets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma  ALPHA beta"),      // reorder + case + extra space
      (3L, "alpha beta gamma"),       // exact dup of 1
      (4L, "alpha beta beta gamma"),  // different MULTISET (extra beta)
      (5L, "delta")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.tokenSortGroups(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // {1,2,3} collapse (keeper 1, 2 distinct raw texts); 4 and 5 alone
    assert(got === Set((1L, 3L, 2L), (4L, 1L, 1L), (5L, 1L, 1L)))
    // and on the corpus: strictly coarser than exact-text dedup
    val corpus = Tables.documents(spark, sfDir)
    val nTokenSort = graft.operators.Dedup.tokenSortDedup(spark, sfDir).count()
    val nExactText = corpus.select(col("text")).distinct().count()
    assert(nTokenSort <= nExactText)
    assert(nTokenSort > 0)
  }

  test("q93 constraint suite: six pass, temporal check counts real violations") {
    val report = graft.operators.DataQuality.constraintReport(spark, sfDir)
      .collect()
    assert(report.length === 7)
    val byName = report.map(r =>
      r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // the generated corpus satisfies the structural constraints
    byName.filterKeys(_ != "lineitem.l_shipdate >= orders.o_orderdate")
      .foreach { case (name, (n, pass)) =>
        assert(n === 0L && pass, name)
      }
    // ...but genuinely violates the temporal one — the report COUNTS
    // (independent recompute of the violation count)
    val wantTemporal = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate")).count()
    val (gotTemporal, tPass) =
      byName("lineitem.l_shipdate >= orders.o_orderdate")
    assert(gotTemporal === wantTemporal)
    assert(wantTemporal > 0L && !tPass)
  }

  test("q91 erasure: COW rewrites only hit partitions; unpublished erase invisible") {
    val (mod, rem) = (50, 7)
    CowErasure.invalidate(spark, sfDir, mod, rem)
    val path = CowErasure.tablePath(spark, sfDir, mod, rem)
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // base publish, then record every v1 data file's (path, mtime, len)
    CowErasure.publishBase(spark, sfDir, path)
    def v1Files() = fsys.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/v=1")).toSeq
      .filter(_.isDirectory)
      .flatMap(d => fsys.listStatus(d.getPath).toSeq)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.toString, f.getModificationTime, f.getLen))
    val before = v1Files().sortBy(_._1)

    // crash window: erase WITHOUT publishing — readers must still see
    // the pre-erasure corpus through manifest_v1
    CowErasure.eraseCow(spark, sfDir, path, mod, rem, publish = false)
    val preErase = CowErasure.readTable(spark, path)
    assert(preErase.filter(pmod(col("doc_id"), lit(mod)) === rem).count() > 0,
      "unpublished erasure leaked into the read path")

    // complete the erasure (self-heals over the crash-window files)
    CowErasure.eraseCow(spark, sfDir, path, mod, rem, publish = true)

    // v1 files are UNTOUCHED — same paths, mtimes, lengths (COW)
    assert(v1Files().sortBy(_._1) === before, "v1 files were rewritten")

    // v=2 holds exactly the partitions that had a deletion hit
    val affected = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(mod)) === rem)
      .select(col("source")).distinct().collect()
      .map(_.getString(0)).toSet
    val v2Dirs = fsys.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/v=2")).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("source="))
      .map(_.stripPrefix("source=")).toSet
    assert(v2Dirs === affected)
    assert(affected.nonEmpty && affected.size < 20,
      s"deletion list must hit a strict subset of partitions: $affected")

    // the published table equals the anti-filtered corpus exactly
    val got = CowErasure.readTable(spark, path)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val want = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(mod)) =!= rem)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got === want)

    // and the registered summary carries the right ownership split
    val summary = CowErasure.erasedSummary(spark, sfDir, mod, rem).collect()
    summary.foreach { r =>
      val (src, owner) = (r.getString(0), r.getInt(1))
      assert(owner === (if (affected.contains(src)) 2 else 1), src)
    }
  }
}
