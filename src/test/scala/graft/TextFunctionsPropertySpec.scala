package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Property tests for the text primitives every dedup/text operator is
  * built from, over generated (incl. unicode and pathological
  * whitespace) inputs. ScalaCheck generators driven directly with fixed
  * seeds — the scalatest/scalacheck bridge artifact is not in the
  * offline cache (same pattern as TwoLevelMeanPropertySpec).
  */
class TextFunctionsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // strings mixing letters, digits, punctuation, unicode, and whitespace
  private val charGen: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\t', '\n', '\r', '\f'),
    1 -> Gen.oneOf('.', ',', '!', 'ß', 'é', '中', '的', 'Ω', '☃'))
  private val strGen: Gen[String] = Gen.listOf(charGen).map(_.mkString)

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => strGen.apply(Gen.Parameters.default, Seed(7L + i)))

  test("hash64 is always in [0, 2^60) on arbitrary strings") {
    val df = (samples(300) :+ "" :+ "   ").toDF("s")
      .select(hash64(col("s")).as("h"))
    assert(df.filter(col("h") < 0 || col("h") >= lit(1L << 60)).count() === 0)
  }

  test("rollingHash stays in [0, RollP) and is order-sensitive") {
    val df = (samples(200) :+ "a b c").toDF("s")
      .select(rollingHash(tokens(col("s"))).as("r"))
    assert(df.filter(col("r") < 0 || col("r") >= lit(RollP)).count() === 0)
    val Seq(ab, ba) = Seq("alpha beta", "beta alpha").toDF("s")
      .select(rollingHash(tokens(col("s"))).as("r"))
      .collect().map(_.getLong(0)).toSeq
    assert(ab !== ba)
  }

  test("word-3-gram shingle laws: count bound, width, distinctness") {
    val df = samples(300).toDF("s")
      .select(tokens(col("s")).as("t"))
      .select(col("t"), shinglesFromTokens(col("t"), 3).as("sh"))
    // count: 0 when fewer than 3 tokens, else at most nTokens - 2
    assert(df.filter(
      when(size(col("t")) < 3, size(col("sh")) =!= 0)
        .otherwise(size(col("sh")) > size(col("t")) - 2)).count() === 0)
    // width: every shingle is exactly 3 whitespace-joined tokens
    assert(df.select(explode(col("sh")).as("g"))
      .filter(size(split(col("g"), " ")) =!= 3).count() === 0)
    // distinctness: shingle arrays carry no duplicates
    assert(df.filter(size(col("sh")) =!= size(array_distinct(col("sh"))))
      .count() === 0)
  }

  test("normalized is idempotent; fingerprint ignores whitespace layout") {
    val df = samples(300).toDF("s")
    assert(df.filter(
      normalized(normalized(col("s"))) =!= normalized(col("s")))
      .count() === 0)
    // same tokens, different whitespace runs → identical fingerprint
    val pairs = samples(100).map { s =>
      val toks = s.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (toks.mkString(" "), toks.mkString("  \t "))
    }
    val pdf = pairs.toDF("a", "b")
    assert(pdf.filter(fingerprint(col("a")) =!= fingerprint(col("b")))
      .count() === 0)
    assert(pdf.count() > 0)
  }
}
