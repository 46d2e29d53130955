package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal}

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

  /** Deterministic PNG fixture: w×h RGB gradient, re-encoded by the
    * JVM's own PNG writer — real compressed image bytes, no codec
    * stubbing anywhere in the path.
    */
  private def png(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 977) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def pngMedia(rows: (Long, Int, Int)*): org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import spark.implicits._
    rows.map { case (id, w, h) =>
      Multimodal.MediaRow(id, png(w, h, id.toInt), "image/png")
    }.toDS().repartition(2)
  }

  test("m1 real decode: PNG dims/channels from javax.imageio, byte fields stub-par") {
    val media = pngMedia((1L, 40, 30), (2L, 64, 64), (3L, 7, 5))
    val got = Multimodal.extractMeta(media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got(1L).width === 40 && got(1L).height === 30)
    assert(got(2L).width === 64 && got(2L).height === 64)
    assert(got(3L).width === 7 && got(3L).height === 5)
    assert(got.values.forall(_.channels === 3))
    // stub-vs-real column parity: same schema, and the byte-derived
    // fields of the real decode equal the stub's on the same payload
    media.collect().foreach { r =>
      val stub = Multimodal.decodeStub(r)
      val real = Multimodal.decodeImage(r).get
      assert(real.n_bytes === stub.n_bytes)
      assert(real.first_byte === stub.first_byte) // 0x89, the PNG magic
      assert(real.first_byte === 0x89)
      assert(real.last_byte === stub.last_byte)
      assert(real.header_sum === stub.header_sum)
    }
  }

  test("real decode falls back to the stub on undecodable image payloads") {
    import spark.implicits._
    val corrupt = Seq(
      Multimodal.MediaRow(9L, Array[Byte](1, 2, 3, 4), "image/png")).toDS()
    val m = Multimodal.extractMeta(corrupt).head()
    val stub = Multimodal.decodeStub(
      Multimodal.MediaRow(9L, Array[Byte](1, 2, 3, 4), "image/png"))
    assert(m === stub) // one bad blob cannot fail the partition
  }

  test("m3 real decode: tile sampling covers the stride grid, deterministic") {
    val media = pngMedia((1L, 100, 50), (2L, 16, 16), (3L, 10, 10))
    val tiles = Multimodal.sampleTiles(media, tile = 16, stride = 32)
      .collect().groupBy(_.doc_id)
    // 100x50: x in {0,32,64}, y in {0,32} → 6 tiles; 16x16: exactly 1;
    // 10x10 (smaller than one tile): none — frameSample's short-payload rule
    assert(tiles(1L).length === 6)
    assert(tiles(1L).map(t => (t.x, t.y)).toSet ===
      (for (y <- Seq(0, 32); x <- Seq(0, 32, 64)) yield (x, y)).toSet)
    assert(tiles(2L).length === 1)
    assert(!tiles.contains(3L))
    // pixel digests are decode-deterministic across runs
    val again = Multimodal.sampleTiles(media, tile = 16, stride = 32)
      .collect().groupBy(_.doc_id)
    assert(tiles(1L).sortBy(_.tile_idx).map(_.tile_md5).toSeq ===
      again(1L).sortBy(_.tile_idx).map(_.tile_md5).toSeq)
  }

  test("m6 frame energy matches a driver-side byte reference") {
    import org.apache.spark.sql.functions.col
    val (width, stride) = (64, 64)
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = texts.toSeq.flatMap { case (id, t) =>
      // codepoints, not UTF-8 bytes: the operator frames CHARACTERS
      // (split + ascii()), so the reference must count the same units
      // or a non-ASCII char in regenerated testdata would shift every
      // frame offset. Sample VALUES are only unit-identical within the
      // declared ASCII stand-in contract (Multimodal's object doc) —
      // outside ASCII, Spark's ascii() and a codepoint disagree.
      val bs = t.codePoints().toArray
      if (bs.length < width) Seq.empty
      else (0 until (bs.length - width) / stride + 1).map { i =>
        val frame = bs.slice(i * stride, i * stride + width)
        ((id, i), (frame.sum / width.toDouble,
          math.sqrt(frame.map(b => b.toLong * b).sum / width.toDouble),
          frame.max))
      }
    }.toMap
    val got = graft.operators.Multimodal.audioEnergy(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)),
        (r.getDouble(3), r.getDouble(4), r.getInt(5)))).toMap
    assert(got.keySet == expected.keySet)
    assert(got.nonEmpty)
    got.foreach { case (k, (m, rms, p)) =>
      val (em, erms, ep) = expected(k)
      assert(math.abs(m - em) < 1e-12 && math.abs(rms - erms) < 1e-12
        && p == ep, s"frame $k: ($m,$rms,$p) != ($em,$erms,$ep)")
    }
  }

  test("m4 real decode: resize caps the longest edge, never upscales") {
    val media = pngMedia((1L, 128, 96), (2L, 96, 128), (3L, 20, 10))
    val out = Multimodal.resizeImages(media, maxDim = 64)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).out_width === 64 && out(1L).out_height === 48)
    assert(out(2L).out_width === 48 && out(2L).out_height === 64)
    assert(out(3L).out_width === 20 && out(3L).out_height === 10) // no upscale
    assert(out.values.forall(_.out_md5.length === 32))
    // deterministic: same pixels → same digest
    val again = Multimodal.resizeImages(media, maxDim = 64)
      .collect().map(r => r.doc_id -> r.out_md5).toMap
    assert(out.view.mapValues(_.out_md5).toMap === again)
  }

  test("m8: multi-probe hamming join is lossless vs brute force") {
    import spark.implicits._
    // seeded 60-bit sigs + planted pairs at controlled distances:
    // 0, 1, 7, 12 must be found; 13 must not (radius 12)
    val rnd = new scala.util.Random(42)
    def flip(sig: Long, k: Int): Long = {
      var s = sig
      rnd.shuffle((0 until 60).toList).take(k).foreach(i => s ^= 1L << i)
      s
    }
    val base = Seq.fill(80)(rnd.nextLong() & ((1L << 60) - 1))
    val planted = Seq(0, 1, 7, 12, 13).zipWithIndex.map { case (d, i) =>
      (1000L + i, flip(base(i), d))
    }
    val sigs = (base.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      ++ planted).toDF("doc_id", "sig0")
    val got = Dedup.hammingPairsMultiProbe(sigs, "sig0", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // brute-force truth
    val all = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, sa) <- all; (b, sb) <- all if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 12
    } yield (a, b) -> h).toMap
    assert(got === want)
    assert(want.contains((0L, 1000L)) && want.contains((1L, 1001L))
      && want.contains((2L, 1002L)) && want.contains((3L, 1003L)))
    assert(!got.contains((4L, 1004L))) // distance 13 excluded
  }

  test("m8: planted near-duplicate payloads are paired, unrelated are not") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog " * 8
    val aNear = a.replace("quick", "quuck").replace("lazy", "hazy")
    val other = "completely different payload content with other bytes " * 7
    val docs = Seq((1L, a), (2L, aNear), (3L, other))
      .toDF("doc_id", "text")
    val sigs = Multimodal.mediaPHashFrom(docs)
      .withColumnRenamed("phash", "sig0")
    val pairs = Dedup.hammingPairsMultiProbe(sigs, "sig0", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("m9: a repeated frame is no boundary, a flipped frame is; short docs emit nothing") {
    import spark.implicits._
    // frame A: low bytes then high bytes -> bits set in the high half;
    // frame B is A mirrored -> the complementary bit set. A->A distance
    // 0 (no cut), A->B distance 16 (cut). Doc 2 is shorter than one
    // frame and must vanish; doc 3 has exactly one frame (no
    // predecessor) and must vanish too.
    val fa = "a" * 32 + "z" * 32
    val fb = "z" * 32 + "a" * 32
    val docs = Seq((1L, fa + fa + fb), (2L, "tiny"), (3L, fa))
      .toDF("doc_id", "text")
    val got = Multimodal.shotBoundariesFrom(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3), r.getBoolean(4)))
    assert(got.toSeq === Seq((1L, 1, 0, false), (1L, 2, 16, true)), got.toSeq)
  }

  test("m10: planted loud/quiet frames segment into the expected runs") {
    import spark.implicits._
    // 'z'*64 -> ssq 64*122^2 = 952,576 (active); ' '*64 -> 65,536
    // (quiet). Pattern loud,loud,quiet,loud => runs [0,1] and [3,3];
    // an all-quiet doc emits nothing.
    val loud = "z" * 64; val quiet = " " * 64
    val docs = Seq((7L, loud + loud + quiet + loud), (8L, quiet + quiet))
      .toDF("doc_id", "text")
    val got = Multimodal.vadSegmentsFrom(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    val loudSsq = 64L * 122 * 122
    assert(got.toSeq === Seq(
      (7L, 1, 0, 1, 2L, 2 * loudSsq),
      (7L, 2, 3, 3, 1L, loudSsq)), got.toSeq)
  }

  test("m11 patchify: planted 2-D pattern lands in the right patches") {
    import spark.implicits._
    // 4×4 image, 2×2 patches: rows "aaab" / "aaab" / "aaab" / "cccb" —
    // patch 0 = all 'a' (97), patch 1 = column of 'b' (98) over 'a',
    // patch 2 = 'a' rows then 'c' (99) row, patch 3 = mixed b/c.
    val img = "aaab" + "aaab" + "aaab" + "cccb"
    val got = Multimodal.patchifyFrom(Seq((1L, img)).toDF("doc_id", "text"),
        side = 4, ps = 2).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    assert(got.toSeq === Seq(
      (0, 4L * 97, 97, 97),                 // a a / a a
      (1, 2L * 97 + 2L * 98, 97, 98),       // a b / a b
      (2, 2L * 97 + 2L * 99, 97, 99),       // a a / c c
      (3, 97 + 98L + 99 + 98, 97, 99)),     // a b / c b
      got.toSeq)
    // a doc shorter than the plane emits nothing
    assert(Multimodal.patchifyFrom(Seq((2L, "abc")).toDF("doc_id", "text"),
      side = 4, ps = 2).collect().isEmpty)
  }

  /** Sequential reference of m12's fixed-point DCT hash — same matrix,
    * plain Scala Long arithmetic, so the distributed expression tree is
    * what the comparison exercises.
    */
  private def refDctHash(text: String): Long = {
    val m = Multimodal.dctMatrix(16, 8)
    val p = text.take(256).map(_.toInt)
    val a = Array.tabulate(8, 16)((u, c) =>
      (0 until 16).map(r => m(u * 16 + r) * p(r * 16 + c)).sum)
    val cf = (for (u <- 0 until 8; v <- 0 until 8)
      yield (0 until 16).map(c => a(u)(c) * m(v * 16 + c)).sum).toVector
    val med = cf.drop(1).sorted.apply(31)
    (1 until 64).map(k => if (cf(k) > med) 1L << (k - 1) else 0L).sum
  }

  test("m12 DCT hash matches the sequential fixed-point reference") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val texts = (1L to 4L).map(i =>
      i -> (0 until 256).map(_ => (32 + r.nextInt(95)).toChar).mkString)
    val got = Multimodal.dctHashFrom(texts.toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) === refDctHash(t), s"doc $id hash mismatch")
    }
    // hashes are 63-bit non-negative with at most 31 bits set (strictly
    // above the median of 63)
    got.values.foreach { h =>
      assert(h >= 0L)
      assert(java.lang.Long.bitCount(h) <= 31)
    }
  }

  test("m12 is brightness-shift stable and structure-sensitive") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    val base = (0 until 256).map(_ => (40 + r.nextInt(60)).toChar).mkString
    val brighter = base.map(c => (c + 5).toChar) // uniform +5 on every byte
    val scrambled =
      new scala.util.Random(13).shuffle(base.toSeq).mkString
    val rows = Multimodal.dctHashFrom(
        Seq((1L, base), (2L, brighter), (3L, scrambled))
          .toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // a uniform brightness shift moves (almost) only the DC
    // coefficient, which m12 excludes: the hash stays within a couple
    // of rounding-residual bit flips
    assert(java.lang.Long.bitCount(rows(1) ^ rows(2)) <= 2,
      s"brightness shift flipped ${java.lang.Long.bitCount(rows(1) ^ rows(2))} bits")
    // destroying the spatial structure rewrites the spectrum
    assert(java.lang.Long.bitCount(rows(1) ^ rows(3)) >= 8,
      s"scramble flipped only ${java.lang.Long.bitCount(rows(1) ^ rows(3))} bits")
  }

  test("m12 on the corpus: deterministic, short docs excluded") {
    val a = Multimodal.mediaDctHash(spark, sfDir).collect()
    val b = Multimodal.mediaDctHash(spark, sfDir).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val nLong = Tables.documents(spark, sfDir)
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) >= 256).count()
    assert(a.length === nLong)
  }

  test("m13 planted: exact + brightness-shifted dups pair, unrelated docs don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val r = new scala.util.Random(7)
    def rand() = (0 until 256).map(_ => (40 + r.nextInt(60)).toChar).mkString
    val base = rand(); val other = rand()
    val docs = Seq((1L, base), (2L, base),
      (3L, base.map(c => (c + 5).toChar)), (4L, other))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.hammingPairsMultiProbe(
        graft.operators.Multimodal.dctHashFrom(docs)
          .select(col("doc_id"), col("phash").as("sig0")),
        "sig0", maxHamming = 12, bits = 63)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0)               // exact duplicate
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 2) // brightness
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc paired: $pairs")
  }

  test("m13 on the corpus equals a driver-side exact all-pairs recompute") {
    val sigs = Multimodal.mediaDctHash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 12
    } yield (a, b, h)).sortBy(x => (x._1, x._2)).toSeq
    val got = Multimodal.mediaDctHashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === want, s"got ${got.length} want ${want.length} pairs")
  }

  test("m14 planted: constant, two-symbol, and all-distinct payloads get textbook stats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa"),            // constant: collision prob 1, mode = n
      (2L, "abababab"),            // uniform 2 symbols: collision 1/2
      (3L, "abcdefgh"),            // 8 distinct: collision 1/8
      (4L, ""))                    // empty: excluded
      .toDF("doc_id", "text")
    val rows = graft.operators.Multimodal.byteEntropyFrom(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    // collision probabilities are EXACT doubles here (dyadic ratios)
    assert(rows(1L) === ((8L, 1L, 8L, 64L, 1.0)))
    assert(rows(2L) === ((8L, 2L, 4L, 32L, 0.5)))
    assert(rows(3L) === ((8L, 8L, 1L, 8L, 0.125)))
    // the Shannon companion still reports textbook bits
    val bits = graft.operators.Multimodal.byteEntropyBits(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(bits(1L) === 0.0)
    assert(math.abs(bits(2L) - 1.0) < 1e-12)
    assert(math.abs(bits(3L) - 3.0) < 1e-12)
  }

  test("m14 on the corpus: collision prob in [1/d, 1], sum_c2 consistent; entropy bounded") {
    val rows = Multimodal.byteEntropy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, mode, s2, cp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))
      assert(d >= 1 && d <= n && mode >= 1 && mode <= n)
      // Cauchy–Schwarz floor n²/d ≤ Σc²; mode ceiling Σc² ≤ mode·n
      assert(s2 * d >= n * n && s2 <= mode * n, s"sum_c2 $s2 out of bounds")
      assert(cp === s2.toDouble / (n.toDouble * n.toDouble))
    }
    val bits = Multimodal.byteEntropyBits(
      Tables.documents(spark, sfDir)).collect()
    bits.foreach { r =>
      val (d, h) = (r.getLong(2), r.getDouble(4))
      assert(h >= -1e-12 && h <= math.log(d.toDouble) / math.log(2.0) + 1e-12,
        s"entropy $h outside [0, log2($d)]")
    }
  }

  test("m9 on the corpus: every emitted frame has a predecessor; flags match dists") {
    val rows = Multimodal.shotBoundaries(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) >= 1)) // frame_idx 0 never emitted
    assert(rows.forall(r => r.getBoolean(4) === (r.getInt(3) >= 9)))
    // offsets follow the m6 1-based stride convention
    assert(rows.forall(r => r.getInt(2) === r.getInt(1) * 64 + 1))
  }

  test("m16 planted: identical plane ranks first at cos 1.0, scaled plane ties by construction") {
    import spark.implicits._
    // doc 0 (probe) and doc 7: identical 256-char planes → cos exactly
    // 1.0 (dot == na == nb). doc 3: same plane with every code's
    // brightness doubled via a different char — 'b'(98) vs '1'(49):
    // exact 2× per patch sum → also cos 1.0 (scale invariance), ties
    // break on neighbor_id. doc 5: an unrelated plane, lower cos.
    val a = "1" * 256
    val b = "b" * 256
    val mix = ("1" * 128) + ("z" * 128)
    val docs = Seq((0L, a), (7L, a), (3L, b), (5L, mix)).toDF("doc_id", "text")
    val got = Multimodal.patchEmbedTopKFrom(docs, queryMod = 50).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).distinct.toSeq == Seq(0L), "only doc 0 probes")
    // ranks 1 and 2 are the two cos==1.0 matches, id-ordered
    assert(got(0) == ((0L, 1, 3L, 1.0)), s"got ${got(0)}")
    assert(got(1) == ((0L, 2, 7L, 1.0)), s"got ${got(1)}")
    assert(got(2)._3 == 5L && got(2)._4 < 1.0 && got(2)._4 > 0.0)
  }

  test("m16 on the corpus matches a driver-side exact recompute") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= 256)
    def embOf(t: String): Array[Long] =
      Array.tabulate(16) { kk =>
        (0 until 16).map { j =>
          t.charAt(((kk / 4) * 4 + j / 4) * 16 + (kk % 4) * 4 + j % 4)
            .toLong
        }.sum
      }
    val embs = docs.map { case (id, t) => id -> embOf(t) }.toMap
    def cos(x: Array[Long], y: Array[Long]): Double = {
      val dot = x.zip(y).map { case (u, v) => u * v }.sum
      val na = x.map(u => u * u).sum
      val nb = y.map(v => v * v).sum
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val expected = embs.keys.filter(_ % 50 == 0).toSeq.sorted.flatMap { qid =>
      embs.keys.filter(_ != qid).toSeq
        .map(n => (n, cos(embs(qid), embs(n))))
        .sortBy { case (n, c) => (-c, n) }.take(3).zipWithIndex
        .map { case ((n, c), i) => (qid, i + 1, n, c) }
    }
    val got = Multimodal.patchEmbedTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected, s"got ${got.take(3).mkString(",")} " +
      s"want ${expected.take(3).mkString(",")}")
    assert(got.nonEmpty)
  }
}
