package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table: token counting,
  * heuristic language-ID, quality scoring, and content fingerprinting
  * (the training-data-pipeline surface the north star asks for beyond
  * the reference's own ops).
  *
  * Scale posture: all four are embarrassingly parallel scans — no
  * shuffle at all except the aggregation in langIdAccuracy; all string
  * work is built-in codegen'd expressions.
  */
object TextAnalysis {

  /** Token statistics per document: whitespace tokens, distinct tokens,
    * BPE-ish word pieces (letter runs / digits / single punctuation —
    * the classic pre-tokenizer shape), and mean token length.
    */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    // Materialize the token array once: each downstream reference to a
    // tokenization *expression* would re-run split+filter per use.
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
    val toks = col("toks")
    d.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct_tokens"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0))).as("n_wordpieces"),
        (aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks)).as("mean_token_len"))
      .orderBy(col("doc_id"))
  }

  /** Heuristic language-ID: stopword-hit count per language, argmax with
    * fixed precedence (en, de, es, fr, zh). Returns the prediction next
    * to the labeled lang for downstream accuracy measurement.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
    val toks = col("toks")
    val withHits = d.select(
      (col("doc_id") +: col("lang").as("labeled_lang") +:
        stopwordLists.map { case (l, words) =>
          stopwordHits(toks, words).as(s"hits_$l")
        }): _*)
    // argmax with Seq-order precedence: first lang whose hits >= all others
    val langs = stopwordLists.map(_._1)
    val pred = langs.foldRight(lit(langs.last)) { case (l, elseCol) =>
      val isMax = langs.filter(_ != l)
        .map(o => col(s"hits_$l") >= col(s"hits_$o"))
        .reduce(_ && _)
      when(isMax, lit(l)).otherwise(elseCol)
    }
    withHits.select(col("doc_id"), col("labeled_lang"),
        pred.as("predicted_lang"),
        col("hits_en"), col("hits_de"), col("hits_es"), col("hits_fr"), col("hits_zh"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: length, punctuation density, stopword ratio,
    * uppercase density, and a fixed-weight composite score in [0,1]-ish.
    * The formula is arbitrary but deterministic and oracle-mirrored.
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
    val toks = col("toks")
    val nChars = length(col("text")).cast("double")
    val nToks = size(toks).cast("double")
    val punct = size(regexp_extract_all(col("text"),
      lit("[.,;:!?]"), lit(0))).cast("double")
    val upper = size(regexp_extract_all(col("text"),
      lit("[A-Z]"), lit(0))).cast("double")
    val stops = stopwordHits(toks, stopwordLists.head._2).cast("double")
    d.select(
        col("doc_id"),
        nChars.as("n_chars"),
        nToks.as("n_tokens"),
        (punct / nChars).as("punct_ratio"),
        (upper / nChars).as("upper_ratio"),
        (stops / nToks).as("stopword_ratio"),
        (lit(0.5) * (stops / nToks) +
          lit(0.3) * (lit(1.0) - punct / nChars) +
          lit(0.2) * least(nToks / lit(100.0), lit(1.0))).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprints: md5 of normalized text, the 60-bit integer
    * hash used by the sketching operators, and an order-sensitive
    * polynomial rolling hash over the token sequence.
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        fingerprint(col("text")).as("fp_md5"),
        hash64(normalized(col("text"))).as("fp_hash64"),
        rollingHash(col("toks")).as("fp_rolling"))
      .orderBy(col("doc_id"))
}
