package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Similarity, TextAnalysis}
import graft.plans.PlanChecks

/** r13 additions: sign-bit hamming search (s19), bounded BFS
  * reachability (g8), RAKE keywords (t34) — each checked against an
  * independent driver-side recompute (different code path from the
  * registered plan), plus the plan shapes promised at scale.
  */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("s19 packed hamming equals direct sign-bit disagreement count") {
    val df = Similarity.signHammingTopK(spark, sfDir, k = 5, nQueries = 3)
    val embs = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def ham(a: Array[Float], b: Array[Float]): Int =
      a.indices.count(i => (a(i) >= 0f) != (b(i) >= 0f))
    val got = df.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, n, h) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(h === ham(embs(q), embs(n)).toLong, s"q=$q n=$n")
    }
    // ranks are contiguous 1..k per query, hamming non-decreasing
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      assert(sorted.map(_.getLong(3)).toSeq ===
        sorted.map(_.getLong(3)).sortBy(identity).toSeq)
    }
    // scale shape: the tiny query side broadcasts (non-equi join ⇒
    // nested-loop flavor, the s1 shape), partial top-k at the window
    assert(PlanChecks.hasBroadcastNestedLoop(df))
    assert(PlanChecks.hasWindowGroupLimit(df))
  }

  test("s20 two-tier rerank equals a driver-side shortlist+cosine recompute") {
    val df = Similarity.hammingRerankTopK(spark, sfDir,
      k = 5, nQueries = 3, shortlist = 20)
    val embs = Tables.embeddings(spark, sfDir)
      .filter(size(col("embedding")) === 64).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def ham(a: Array[Float], b: Array[Float]): Long =
      a.indices.count(i => (a(i) >= 0f) != (b(i) >= 0f)).toLong
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (0L until 3L).flatMap { q =>
      val shortIds = embs.keys.filter(_ != q).toSeq
        .map(n => (ham(embs(q), embs(n)), n)).sorted.take(20).map(_._2)
      shortIds.map(n => (n, cos(embs(q), embs(n))))
        .filter(x => !x._2.isNaN)
        .sortBy { case (n, c) => (-c, n) }.take(5).zipWithIndex
        .map { case ((n, c), i) => (q, i + 1, n, c) }
    }.toSet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === want)
  }

  test("d35 persisted chunk store: save -> append -> load equals direct compute") {
    import graft.operators.{Dedup, IndexStore}
    // persisted path (builds the store on first run under target/)
    val persisted = IndexStore.persistedChunkNovelty(spark, sfDir).collect()
    // direct path: same slices, no persistence
    val docs = Tables.documents(spark, sfDir)
    def hashes(slice: org.apache.spark.sql.DataFrame) =
      Dedup.cdcChunks(slice, 8, 64)
        .select(md5(col("chunk")).as("chunk_md5"),
          length(col("chunk")).cast("long").as("chunk_len"))
    val store = hashes(docs.filter(pmod(col("doc_id"), lit(3)) =!= 0))
      .select(col("chunk_md5")).distinct().withColumn("known", lit(true))
    val direct = Dedup.cdcChunks(
        docs.filter(pmod(col("doc_id"), lit(3)) === 0), 8, 64)
      .select(col("doc_id"), md5(col("chunk")).as("chunk_md5"),
        length(col("chunk")).cast("long").as("chunk_len"))
      .join(store, Seq("chunk_md5"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("known"), 1L).otherwise(0L)).as("n_known"),
        sum(col("chunk_len")).as("n_bytes"),
        sum(when(col("known"), col("chunk_len")).otherwise(0L))
          .as("n_known_bytes"))
      .withColumn("known_frac",
        col("n_known_bytes").cast("double") / col("n_bytes").cast("double"))
      .orderBy(col("doc_id")).collect()
    assert(persisted.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
    assert(persisted.nonEmpty)
    // a store loaded under a DIFFERENT chunker scheme must refuse
    val tmp = s"target/graft_index/chunks/spec_stale_${System.nanoTime()}"
    IndexStore.saveChunks(hashes(docs.limit(5)), tmp, 8, 64)
    intercept[IllegalArgumentException] {
      IndexStore.loadChunks(spark, tmp, 8, 32).collect()
    }
  }

  test("g8 ring census matches a driver-side BFS") {
    val df = Graph.reachability(spark, sfDir, maxHops = 4, seedMod = 500)
    val got = df.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // driver BFS over the same trade graph
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), (col("o_custkey") * 2).as("cv"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("sv"))
    val adj = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("cv"), col("sv")).distinct().collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = Tables.customer(spark, sfDir)
      .filter(pmod(col("c_custkey"), lit(500)) === 0)
      .select(col("c_custkey") * 2).collect().map(_.getLong(0)).toSet
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to 4) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> h)
      frontier = next
    }
    val want = dist.groupBy(_._2).map { case (d, vs) =>
      d -> (vs.size.toLong,
        vs.keys.count(_ % 2 == 0).toLong, vs.keys.count(_ % 2 == 1).toLong)
    }
    assert(got === want)
  }

  test("d34 CDC chunking survives a prefix insertion (boundary shift-resilience)") {
    import spark.implicits._
    val boiler = ("standard legal disclaimer text that repeats across documents " +
      "and is long enough to span several content defined chunks ") * 4
    val docs = Seq(
      (1L, "unique head one " + boiler),
      (2L, "a completely different and much longer unique preamble " +
        "that shifts every byte offset " + boiler),
      (3L, "entirely unrelated content with no repetition at all here"))
      .toDF("doc_id", "text")
    // m = 16 (not the registered 64): the planted boilerplate has only
    // ~120 distinct 8-char windows, and at 1/64 hit rate a corpus that
    // small can draw ZERO boundaries (observed); the assertion is about
    // boundary CONTENT-STABILITY, which is m-independent
    val groups = graft.operators.Dedup.cdcChunkDedupFrom(docs, m = 16).collect()
    // the shared boilerplate must yield chunks present in BOTH docs
    // despite the differing prefix lengths (fixed-size blocking would
    // find none); doc 3 shares nothing
    val cross = groups.filter(r => r.getLong(2) >= 2)
    assert(cross.nonEmpty, "no cross-document chunks found")
    assert(groups.forall(_.getLong(1) >= 2))
    // reassembly sanity via the relation: total duplicated bytes are
    // bounded by the boilerplate's length times copies
    cross.foreach(r => assert(r.getLong(3) <= boiler.length))
  }

  test("m15 channel moments equal a driver-side strided recompute") {
    val df = graft.operators.Multimodal.channelStats(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
      .filter(_._2.length >= 3)
    assert(got.nonEmpty)
    docs.foreach { case (id, text) =>
      val cps = text.codePoints().toArray // codepoint-indexed like split("")
      (0 to 2).foreach { ch =>
        val xs = cps.indices.filter(_ % 3 == ch).map(cps(_).toLong)
        val (n, s1, s2) = (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
        val (gn, gs1, gs2, gMean, gStd) = got((id, ch))
        assert((gn, gs1, gs2) === ((n, s1, s2)), s"doc=$id ch=$ch")
        assert(gMean === s1.toDouble / n)
        assert(gStd === math.sqrt((n * s2 - s1 * s1).toDouble / (n * n).toDouble))
      }
    }
  }

  test("t34 RAKE matches a driver-side recompute and contains no stopwords") {
    val stops = graft.functions.TextFunctions.stopwordLists.head._2.toSet
    val df = TextAnalysis.rakeKeywords(spark, sfDir, k = 3)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3)))
      .toMap
    got.values.foreach { case (phrase, score) =>
      assert(phrase.split(" ").forall(w => !stops.contains(w)), phrase)
      assert(score > 0.0)
    }
    // independent scala RAKE over the raw text
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val want = scala.collection.mutable.Map[(Long, Int), (String, Double)]()
    docs.foreach { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      // phrases: maximal stopword-free runs
      val phrases = scala.collection.mutable.ArrayBuffer[Array[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      toks.foreach { t =>
        if (stops.contains(t)) { if (cur.nonEmpty) { phrases += cur.toArray; cur.clear() } }
        else cur += t
      }
      if (cur.nonEmpty) phrases += cur.toArray
      if (phrases.nonEmpty) {
        val deg = scala.collection.mutable.Map[String, Long]()
        val freq = scala.collection.mutable.Map[String, Long]()
        phrases.foreach(p => p.foreach { w =>
          deg(w) = deg.getOrElse(w, 0L) + p.length
          freq(w) = freq.getOrElse(w, 0L) + 1L
        })
        val scored = phrases.map { p =>
          val sc = p.foldLeft(0.0)((a, w) => a + deg(w).toDouble / freq(w).toDouble)
          (p.mkString(" "), sc)
        }.groupBy(_._1).map { case (ph, xs) => (ph, xs.map(_._2).max) }.toSeq
        scored.sortBy { case (ph, sc) => (-sc, ph) }.take(3).zipWithIndex
          .foreach { case ((ph, sc), i) => want((id, i + 1)) = (ph, sc) }
      }
    }
    assert(got === want.toMap)
  }
}
