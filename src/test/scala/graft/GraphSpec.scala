package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  /** Independent fixed-point PageRank in plain Scala Long arithmetic —
    * the same recurrence the operator documents, computed sequentially
    * so the distributed plumbing is what the comparison exercises.
    */
  private def referencePr(edges: Seq[(String, String)], iters: Int)
      : Map[String, Long] = {
    val sym = edges ++ edges.map(_.swap)
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val vs = sym.map(_._1).distinct.sorted
    val n = vs.size.toLong
    val scale = 1000000000000L
    val base = (15L * scale) / (100L * n)
    var r = vs.map(v => v -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2)
      r = vs.map { v =>
        val s = in(v).map { case (u, _) => r(u) / deg(u) }.sum
        v -> (base + (85L * s) / 100L)
      }.toMap
    }
    r
  }

  test("g1 planted: distributed fixed-point ranks equal the sequential fold exactly") {
    import spark.implicits._
    // star (x hub) + a pendant path: asymmetric degrees exercise the
    // div-by-degree and the hub should out-rank the leaves
    val undirected =
      Seq(("x", "a"), ("x", "b"), ("x", "c"), ("c", "d"))
    val sym = (undirected ++ undirected.map(_.swap))
      .toDF("src", "dst")
    val got = Graph.pageRankOver(sym, iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referencePr(undirected, 3)
    assert(got === want, s"got $got want $want")
    // hub dominates
    assert(got.maxBy(_._2)._1 === "x")
  }

  test("g1 on the corpus: full rank coverage, ordered output, sane mass") {
    val rows = Graph.pageRank(spark, sfDir).collect()
    assert(rows.length === 20)
    val fps = rows.map(_.getLong(1))
    assert(fps.zip(fps.tail).forall { case (a, b) => a >= b }, "not desc")
    // every rank positive and below total mass; double column consistent
    assert(fps.forall(f => f > 0 && f < 1000000000000L))
    rows.foreach { r =>
      assert(r.getDouble(2) === r.getLong(1).toDouble / 1e12)
    }
  }

  test("g2 planted: one triangle plus a dangling edge counts exactly once") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("pa", "pb")
    val r = Graph.triangleCountOver(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 4L, 1L)))
  }

  test("g2 planted: K4 has four triangles") {
    import spark.implicits._
    val vs = Seq(1L, 2L, 3L, 4L)
    val edges = (for { a <- vs; b <- vs if a < b } yield (a, b))
      .toDF("pa", "pb")
    val r = Graph.triangleCountOver(edges).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 6L, 4L)))
  }

  test("g2 on the corpus: stats are internally consistent") {
    val r = Graph.triangleCount(spark, sfDir).collect().head
    val (nv, ne, nt) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv > 0 && ne > 0 && nt >= 0)
    // triangles are bounded by the wedge count upper bound ne*(ne-1)/2
    assert(nt <= ne * (ne - 1) / 2)
  }

  test("g3 planted: triangle + pendant gets exact per-vertex coefficients") {
    import spark.implicits._
    // K3 {1,2,3} plus pendant edge (3,4): cc(1)=cc(2)=1, cc(3)=1/3,
    // vertex 4 has degree 1 and is excluded from the relation
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("pa", "pb")
    val rows = Graph.clusteringCoeffOver(edges, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      (1L, 2L, 1L, 1.0),
      (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 1.0 / 3.0)))
  }

  test("g3 planted: every K4 vertex closes all its wedges") {
    import spark.implicits._
    val vs = Seq(1L, 2L, 3L, 4L)
    val edges = (for { a <- vs; b <- vs if a < b } yield (a, b))
      .toDF("pa", "pb")
    val rows = Graph.clusteringCoeffOver(edges, topK = 10).collect()
    assert(rows.length === 4)
    // deg 3, three triangles through each vertex, cc = 2*3/(3*2) = 1
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getDouble(3)) === ((3L, 3L, 1.0)))
    }
  }

  test("g3 on the corpus: coefficients are in range and self-consistent") {
    val rows = Graph.clusteringCoeff(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ccs = rows.map(_.getDouble(3))
    assert(ccs.zip(ccs.tail).forall { case (a, b) => a >= b }, "not desc")
    rows.foreach { r =>
      val (d, t, cc) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d >= 2 && t >= 0 && cc >= 0.0 && cc <= 1.0)
      // the coefficient is exactly the documented division of the two
      // integer columns — no hidden rounding between them
      assert(cc === 2.0 * t / (d.toDouble * (d - 1)))
      // T(v) cannot exceed the wedge count at v
      assert(t <= d * (d - 1) / 2)
    }
  }

  test("g4 planted: path and triangle-plus-pendant get the hand-computed r") {
    import spark.implicits._
    // path 1-2-3: perfectly disassortative, r = -1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("pa", "pb")
    val rp = Graph.assortativityOver(path).collect().head
    assert((rp.getLong(0), rp.getLong(1)) === ((3L, 2L)))
    assert(rp.getDouble(3) === -1.0)
    // triangle {1,2,3} + pendant (3,4): moments m2=8, sx=18, sxy=38,
    // sxx=44 -> r = (8*38-324)/(8*44-324) = -20/28
    val tp = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("pa", "pb")
    val rt = Graph.assortativityOver(tp).collect().head
    assert((rt.getLong(0), rt.getLong(1)) === ((4L, 4L)))
    assert(rt.getDouble(2) === 2.0) // mean vertex degree 2m/n = 8/4
    assert(rt.getDouble(3) === -20.0 / 28.0)
  }

  test("g4 on the corpus: r is a correlation and the stats line up with g2") {
    val r = Graph.assortativity(spark, sfDir).collect().head
    val (nv, ne, avg, a) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(nv > 0 && ne > 0 && avg > 0)
    assert(a >= -1.0 && a <= 1.0, s"assortativity $a out of range")
    // vertex/edge counts must equal g2's over the same graph
    val g2 = Graph.triangleCount(spark, sfDir).collect().head
    assert((nv, ne) === ((g2.getLong(0), g2.getLong(1))))
  }

  test("g5 planted: clique-plus-tail gets the textbook core numbers") {
    import spark.implicits._
    // K4 {a,b,c,d} with a tail d-e-f: the clique is the 3-core, the
    // tail peels at k=2 — core numbers 3,3,3,3,1,1 (e.g. Batagelj-
    // Zaversnik peeling). The h-index fixpoint must equal them.
    val undirected = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("d", "e"), ("e", "f"))
    val sym = (undirected ++ undirected.map(_.swap)).toDF("src", "dst")
    val got = Graph.corenessOver(sym, rounds = 6).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got === Map(
      "a" -> ((3L, 3)), "b" -> ((3L, 3)), "c" -> ((3L, 3)),
      "d" -> ((4L, 3)), "e" -> ((2L, 1)), "f" -> ((1L, 1))))
  }

  test("g6 planted: hand-computed Jaccard, absent pairs absent, ties break on keys") {
    import spark.implicits._
    // customers -> suppliers: c1 {1,2,3}, c2 {1,2}, c3 {2,3}, c4 {4}
    // degrees: d1=2, d2=3, d3=2, d4=1
    // inter: (1,2)=2, (1,3)=1, (2,3)=2 -> jaccard (1,2)=2/3,
    // (2,3)=2/3, (1,3)=1/3; supplier 4 shares nobody -> no pair
    val cs = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L), (4L, 4L)).toDF("c", "sv")
    val got = Graph.supplierOverlapFrom(cs, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 2L, 3L, 2.0 / 3.0),
      (2L, 3L, 2L, 3L, 2L, 2.0 / 3.0),
      (1L, 3L, 1L, 2L, 2L, 1.0 / 3.0)))
  }

  test("g6 on the corpus: top-k ordered, jaccard consistent with its own counts") {
    val rows = Graph.supplierOverlap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.length <= 50)
    val js = rows.map(_._6)
    assert(js.zip(js.tail).forall { case (a, b) => a >= b }, "not desc")
    rows.foreach { case (sa, sb, inter, na, nb, j) =>
      assert(sa < sb && inter >= 1 && inter <= math.min(na, nb))
      assert(j === inter.toDouble / (na + nb - inter))
    }
  }

  test("g9 planted: hand-traced synchronous LPA keeps labels inside blocks") {
    import spark.implicits._
    // two complete bipartite blocks ({0,2}×{1,3} and {10,12}×{11,13})
    // plus one weak bridge 3–10. Hand-traced 3 synchronous rounds
    // (plurality, ties → min label): the sides of each block swap
    // labels every round (the documented bipartite 2-cycle), but no
    // label ever crosses the bridge — block structure holds.
    val und = Seq((0L, 1L), (0L, 3L), (2L, 1L), (2L, 3L),
      (10L, 11L), (10L, 13L), (12L, 11L), (12L, 13L), (3L, 10L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.communitiesOver(sym, rounds = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      0L -> ((1L, 2L)), 2L -> ((1L, 2L)), 1L -> ((0L, 2L)),
      3L -> ((0L, 2L)), 10L -> ((3L, 2L)), 12L -> ((3L, 2L)),
      11L -> ((10L, 2L)), 13L -> ((10L, 2L))))
  }

  test("g9 on the corpus: total census conserved, labels are real vertices") {
    val rows = Graph.communities(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val vertices = rows.map(_._1).toSet
    assert(rows.map(_._2).forall(vertices), "every community label is a vertex")
    // community_size is the exact census of its label
    val byLab = rows.groupBy(_._2)
    rows.foreach { case (v, lab, sz) =>
      assert(sz == byLab(lab).length, s"$v: size $sz != ${byLab(lab).length}")
    }
    assert(rows.map(_._1).distinct.length == rows.length, "one row per vertex")
  }

  test("g6 capped-customer telemetry: 0 on the corpus, planted hub counted") {
    import spark.implicits._
    // the sf corpus has no customer within an order of magnitude of
    // the 1000-supplier default cap — the published g6_capped_customers
    // field must read 0 here, so a nonzero value in a bench artifact
    // is always a real coverage-loss signal
    assert(Graph.supplierOverlapCappedCount(spark, sfDir) === 0L)
    // planted: c1 fans out to 3 suppliers, c2 to 1 — cap at 2 drops c1
    val cs = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)).toDF("c", "sv")
    assert(Graph.cappedCountFrom(cs, maxFanout = 2) === 1L)
    assert(Graph.cappedCountFrom(cs, maxFanout = 3) === 0L)
  }

  test("g5 on the corpus: the fixed round budget reaches the fixpoint") {
    def run(rounds: Int) = Graph.coreness(spark, sfDir, rounds).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val at6 = run(6)
    assert(at6 === run(7), "round 7 changed a coreness — budget too small")
    assert(at6.nonEmpty)
    // coreness can never exceed degree, and the max coreness is the
    // graph's degeneracy (> 0 on any graph with an edge)
    assert(at6.forall { case (_, d, c) => c <= d && c >= 0 })
    assert(at6.map(_._3).max > 0)
  }
}
