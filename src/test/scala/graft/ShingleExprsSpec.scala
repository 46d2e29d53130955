package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions
import graft.functions.TextFunctions._

/** Pins the r15 codegen'd shingle/chunk kernels (TokensLower,
  * WordShingles64, WordShingleStrs, CharShingles64, MinHashSig,
  * WinnowFps64, CdcChunkArr, PosGramsXx64) value-identical to the HOF
  * expression trees they replaced — the original formulations live
  * HERE as the executable reference (the ByteplaneExprsSpec pattern),
  * so production carries only the fast path. Inputs mix ASCII with
  * non-surrogate BMP chars and every Java-regex \s whitespace
  * character, with fixed seeds.
  */
class ShingleExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // tokens/whitespace-rich text: words of ASCII+BMP chars joined by
  // random whitespace runs (every \s char), with random edge padding
  private val wordChar: Gen[Char] = Gen.frequency(
    8 -> Gen.choose(33.toChar, 126.toChar),
    1 -> Gen.oneOf('é', 'ß', '中', 'λ', 'ÿ', 'Α', 'щ'),
    1 -> Gen.oneOf('A', 'Z', 'Q')) // exercises lowercasing
  private val wsChar: Gen[Char] = Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val word: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, wordChar)).map(_.mkString)
  private val ws: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, wsChar)).map(_.mkString)
  private val text: Gen[String] = for {
    n <- Gen.choose(0, 40)
    wds <- Gen.listOfN(n, word)
    seps <- Gen.listOfN(n + 1, ws)
    lead <- Gen.oneOf("", " ", "\t ")
    trail <- Gen.oneOf("", " ", "\n")
  } yield lead + wds.zip(seps).map { case (w, s) => w + s }.mkString + trail

  private def samples(gen: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1300L + i)))

  private def textDf(extra: String*): DataFrame =
    (samples(text, 150) ++ extra :+ "" :+ "a" :+ "one two three four five six"
      :+ "  \t\n  " :+ "中 文 字 符 中 文 字 符 repeat 中 文").toDF("text")

  private def bothCols(fast: Column, ref: Column)(df: DataFrame): Unit = {
    val out = df.select(fast.as("fast"), ref.as("ref"))
    // schema parity matters too: array element type + field nullability
    // feed the oracle's schema hash when a kernel output reaches a
    // query's projection
    val Seq(f, r) = out.schema.fields.toSeq
    assert(f.dataType == r.dataType ||
      f.dataType.simpleString == r.dataType.simpleString,
      s"${f.dataType} vs ${r.dataType}")
    out.collect().foreach { row =>
      assert(row.get(0) == row.get(1) ||
        (row.isNullAt(0) && row.isNullAt(1)),
        s"fast=${row.get(0)} ref=${row.get(1)}")
    }
  }

  test("TokensLower == filter(split(lower, \\s+), nonEmpty)") {
    bothCols(tokens(col("text")), tokensSql(col("text")))(textDf())
  }

  test("TokensLower null propagation matches") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    df.select(tokens(col("text")).as("fast"), tokensSql(col("text")).as("ref"))
      .collect().foreach { r => assert(r.isNullAt(0) == r.isNullAt(1)) }
  }

  /** Original docShingles chain, verbatim (pre-r15): tokens
    * materialized, then word n-grams, distinct, then hash64 per gram.
    */
  private def wordShingles64Ref(df: DataFrame, n: Int): DataFrame =
    df.select(col("text"), tokensSql(col("text")).as("base"))
      .select(col("text"), shinglesFromTokens(col("base"), n).as("shs"))
      .select(col("text"), transform(col("shs"), g => hash64(g)).as("ref"))

  test("WordShingles64 == tokens->ngrams->distinct->hash64") {
    val out = wordShingles64Ref(textDf(), 3)
      .select(TextFunctions.wordShingles64(col("text"), 3).as("fast"), col("ref"))
    out.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("WordShingleStrs == shinglesFromTokens(tokens, 3)") {
    val out = textDf()
      .select(col("text"), tokensSql(col("text")).as("base"))
      .select(TextFunctions.wordShingleStrs(col("text"), 3).as("fast"),
        shinglesFromTokens(col("base"), 3).as("ref"))
    out.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  /** Original docCharShingles gram chain, verbatim (pre-r15). */
  test("CharShingles64 == distinct substr 5-grams -> hash64 (over normalized)") {
    val n = 5
    val out = textDf()
      .select(col("text"), normalized(col("text")).as("base"))
      .select(TextFunctions.charShingles64(col("base"), n).as("fast"),
        transform(
          array_distinct(when(length(col("base")) >= n,
            transform(sequence(lit(1), length(col("base")) - (n - 1)),
              i => col("base").substr(i, lit(n)))).otherwise(array())),
          g => hash64(g)).as("ref"))
    out.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  test("MinHashSig == per-permutation array-min HOF form (signDocs pre-r15)") {
    val params = Seq((3L, 7L), (123456789L, 987654321L), (2147483646L, 1L),
      (1000003L, 2147483000L))
    val p = 2147483647L
    val hashes = (0 until 60).map(i =>
      (0 until (i % 7)).map(j => math.abs((i * 1299721L + j * 15485863L) *
        2654435761L) % (1L << 60)).toArray)
    val df = hashes.toDF("sh")
    val hv = transform(col("sh"), g => pmod(g, lit(p)))
    val ref = array(params.map { case (a, b) =>
      array_min(transform(hv, x => pmod(x * a + b, lit(p))))
    }: _*)
    val out = df.filter(size(col("sh")) > 0)
      .select(TextFunctions.minhashSig(col("sh"), params, p).as("fast"), ref.as("ref"))
    out.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
    }
  }

  /** Original winnow fingerprint chain, verbatim (pre-r15). */
  test("WinnowFps64 == ordered gram hashes -> distinct window minima") {
    val (k, w) = (3, 4)
    val docs = textDf()
      .select(col("text"), tokensSql(col("text")).as("wds"))
    val grams = transform(
      sequence(lit(0), size(col("wds")) - k),
      i => hash64(concat_ws(" ",
        (0 until k).map(j => element_at(col("wds"), i + j + 1)): _*)))
    val refFps = docs.filter(size(col("wds")) >= k + w - 1)
      .withColumn("h", grams)
      .select(col("text"), array_distinct(transform(
        sequence(lit(1), size(col("h")) - (w - 1)),
        i => array_min(slice(col("h"), i, lit(w))))).as("ref"))
    // long docs: the kernel's short-doc empty contract checked below
    refFps.select(TextFunctions.winnowFps64(col("text"), k, w).as("fast"), col("ref"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
      }
    val shorts = docs.filter(size(col("wds")) < k + w - 1)
      .select(TextFunctions.winnowFps64(col("text"), k, w).as("fast"))
    shorts.collect().foreach(r => assert(r.getSeq[Long](0).isEmpty))
  }

  /** Original CDC chunker, verbatim (pre-r15 Dedup.cdcChunks). */
  private def cdcChunksRef(d0: DataFrame, w: Int, m: Int): DataFrame = {
    val d = d0
      .filter(length(col("text")) > 0)
      .select(col("doc_id"),
        filter(split(col("text"), ""), c => c =!= "").as("chars"))
      .withColumn("codes", transform(col("chars"), c => ascii(c).cast("long")))
      .withColumn("n", size(col("chars")))
    val bnd = when(col("n") >= w,
      filter(sequence(lit(w), col("n")), i =>
        pmod(aggregate(slice(col("codes"), i - w + 1, lit(w)), lit(0L),
          (acc, c) => pmod(acc * lit(RollB) + c, lit(RollP))),
          lit(m.toLong)) === 0L)).otherwise(array().cast("array<int>"))
    d.withColumn("ss", concat(array(lit(0)), bnd))
      .withColumn("ee", concat(bnd, array(col("n"))))
      .select(col("doc_id"), col("chars"),
        explode(filter(zip_with(col("ss"), col("ee"),
          (a, b) => struct(a.as("s"), b.as("e"))),
          x => x.getField("e") > x.getField("s"))).as("span"))
      .select(col("doc_id"),
        array_join(slice(col("chars"), col("span.s") + 1,
          col("span.e") - col("span.s")), "").as("chunk"))
  }

  test("CdcChunkArr == rolling-hash boundary chunker (w=8, m=16)") {
    // m=16 so boundaries actually fire on short generated texts
    val (w, m) = (8, 16)
    val df = textDf().withColumn("doc_id", monotonically_increasing_id())
    val ref = cdcChunksRef(df, w, m)
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("chunk"))).as("ref"))
    val fast = df.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(TextFunctions.cdcChunkArr(col("text"), w, m)).as("chunk"))
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("chunk"))).as("fast"))
    val joined = ref.join(fast, Seq("doc_id"), "full")
      .select(col("ref"), col("fast")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1), r.toString)
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
    // chunk ORDER within a doc (ref emits spans in order)
    val refOrd = cdcChunksRef(df, w, m).groupBy(col("doc_id"))
      .agg(collect_list(col("chunk")).as("c")).orderBy("doc_id").collect()
    val fastOrd = df.filter(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(TextFunctions.cdcChunkArr(col("text"), w, m)).as("chunk"))
      .groupBy(col("doc_id")).agg(collect_list(col("chunk")).as("c"))
      .orderBy("doc_id").collect()
    assert(refOrd.map(_.getSeq[String](1)).toSeq ==
      fastOrd.map(_.getSeq[String](1)).toSeq)
  }

  test("WrapSyms == concat(A, array_join(split chars, B+A), B)") {
    val A = "\u0001"; val B = "\u0002"
    val ref = concat(lit(A),
      array_join(filter(split(col("w"), ""), c => c =!= ""), B + A), lit(B))
    val words = textDf().select(explode(tokensSql(col("text"))).as("w"))
    words.select(TextFunctions.wrapSyms(col("w")).as("fast"), ref.as("ref"))
      .collect().foreach { r =>
        assert(r.getString(0) == r.getString(1), r.toString)
      }
  }

  test("piece count via length-replace == size(split(inner, B+A))") {
    val A = "\u0001"; val B = "\u0002"
    // wrapped strings including post-merge shapes (multi-char symbols)
    val df = Seq(s"${A}a$B", s"${A}ab$B${A}c$B", s"${A}x$B${A}y$B${A}z$B",
      s"${A}merged$B${A}q$B").toDF("wrapped")
    df.select(
        size(split(expr("substring(wrapped, 2, length(wrapped) - 2)"),
          B + A)).as("ref"),
        (shiftright(length(col("wrapped")) -
          length(replace(col("wrapped"), lit(B + A), lit(""))), 1) +
          lit(1)).as("fast"))
      .collect().foreach { r => assert(r.getInt(0) == r.getInt(1), r.toString) }
  }

  test("PosGramsXx64 == transform(sequence, xxhash64(substr(i, q)))") {
    val q = 5
    val df = textDf().select(normalized(col("text")).as("t"))
      .withColumn("len", length(col("t")))
      .filter(col("len") >= q)
    val ref = transform(sequence(lit(1), col("len") - (q - 1)),
      i => xxhash64(col("t").substr(i, lit(q))))
    df.select(TextFunctions.posGramsXx64(col("t"), q).as("fast"), ref.as("ref"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), r.toString)
      }
  }
}
