package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the text-analysis and dedup operators
  * (north-star extension surface, SURVEY.md §7.2 step 3; the reference
  * itself has no string processing beyond Split — Sample.cs:151).
  *
  * Everything here is built from codegen'd built-in expressions (no
  * UDFs) and has an exact DuckDB-SQL equivalent, so every op stays
  * oracle-checkable AND stays inside WholeStageCodegen at scale.
  *
  * Hash convention: `hash64(s)` = first 15 hex digits of md5(s) parsed
  * as a base-16 integer — 60 bits, always positive, identical in DuckDB
  * via CAST('0x' || substr(md5(s),1,15) AS BIGINT). md5 gives the same
  * bytes everywhere, making hash-derived operators (fingerprints,
  * MinHash, SimHash) cross-engine deterministic.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped — the codegen'd
    * TokensLower kernel (one pass over the UTF-8 bytes; r15). Value-
    * identical to [[tokensSql]], which ShingleExprsSpec pins it
    * against.
    */
  def tokens(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      TokensLower(org.apache.spark.sql.graft.Shims.expression(c)))

  /** The pre-kernel HOF formulation of [[tokens]] — kept as the
    * executable reference (and the shape the DuckDB oracles mirror).
    */
  def tokensSql(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** Distinct token set (order not significant downstream). */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Word n-gram shingles (space-joined), distinct, from an ALREADY
    * MATERIALIZED token-array column. Empty array for texts shorter
    * than n words.
    *
    * Take a column reference, not a tokenization expression: every
    * `element_at(w, …)` in the lambda re-evaluates its argument
    * expression, so passing `tokens(text)` directly re-tokenizes the
    * document ~3n times per shingle (rewrite-time A/B at sf0.1: ~30×
    * on the dedup pipeline after materializing the tokens first).
    */
  def shinglesFromTokens(w: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*))
    array_distinct(when(size(w) >= n, grams).otherwise(array()))
  }

  /** Convenience form over raw text — only for small inputs/tests; hot
    * paths should materialize `tokens` in a projection and use
    * shinglesFromTokens (see its scaladoc).
    */
  def shingles(c: Column, n: Int): Column = shinglesFromTokens(tokens(c), n)

  /** 60-bit positive hash: first 15 hex chars of md5, base-16.
    * Cross-engine deterministic (see object doc).
    */
  def hash64(c: Column): Column =
    org.apache.spark.sql.graft.Shims.column(
      Md5Hash64(org.apache.spark.sql.graft.Shims.expression(c.cast("string"))))

  /** The pre-Md5Hash64 SQL formulation — kept as the reference the
    * native expression is property-tested against (and the shape the
    * DuckDB oracles mirror).
    */
  def hash64Sql(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ── r15 shingle/chunk kernel wrappers (see ShingleExprs) ───────────
  private def kcol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.Shims.column(e)
  private def kexp(c: Column) = org.apache.spark.sql.graft.Shims.expression(c)

  /** Distinct hashed word n-gram shingles of `c` (the docShingles
    * chain — tokens → n-grams → array_distinct → hash64 — as one
    * kernel).
    */
  def wordShingles64(c: Column, n: Int): Column = kcol(WordShingles64(kexp(c), n))

  /** Distinct hashed char n-gram shingles of an already-normalized
    * string.
    */
  def charShingles64(c: Column, n: Int): Column = kcol(CharShingles64(kexp(c), n))

  /** Distinct word n-gram shingle STRINGS (the un-hashed form the
    * CorpusOps contamination tier joins on).
    */
  def wordShingleStrs(c: Column, n: Int): Column = kcol(WordShingleStrs(kexp(c), n))

  /** Winnowing fingerprint set (ordered k-gram hashes → distinct
    * window-w minima).
    */
  def winnowFps64(c: Column, k: Int, w: Int): Column = kcol(WinnowFps64(kexp(c), k, w))

  /** Content-defined chunks of `c` (rolling-hash boundaries, w-char
    * window, modulus m).
    */
  def cdcChunkArr(c: Column, w: Int, m: Int): Column =
    kcol(CdcChunkArr(kexp(c), w, m, RollB, RollP))

  /** Positional xxhash64 q-gram array of an already-normalized string. */
  def posGramsXx64(c: Column, q: Int): Column = kcol(PosGramsXx64(kexp(c), q))

  /** BPE per-symbol marker wrap (the t29/t35 \u0001...\u0002 form). */
  def wrapSyms(c: Column): Column = kcol(WrapSyms(kexp(c)))

  /** MinHash signature of a pre-hashed shingle array<long>. */
  def minhashSig(c: Column, params: Seq[(Long, Long)], p: Long): Column =
    kcol(MinHashSig(kexp(c), params, p))

  /** Whitespace-normalized text: trim + collapse runs of whitespace. */
  def normalized(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Polynomial rolling hash over a MATERIALIZED token-array column:
    * fold (acc * B + hash64(token) mod P) mod P. Order-sensitive (unlike
    * the set-based sketches), so it fingerprints the token *sequence*.
    * P = 2^31-1 keeps every intermediate < 2^52 — no overflow, and the
    * identical fold runs in DuckDB via list_reduce.
    */
  val RollP = 2147483647L // 2^31 - 1
  val RollB = 1000003L
  def rollingHash(toks: Column): Column =
    aggregate(
      transform(toks, t => pmod(hash64(t), lit(RollP))),
      lit(0L),
      (acc, h) => pmod(acc * lit(RollB) + h, lit(RollP)))

  /** Count of tokens belonging to a fixed stopword list. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column = {
    val set = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** Tiny per-language stopword lists for the heuristic language-ID
    * operator. Precedence order (ties resolve to the earlier entry) is
    * the Seq order: en, de, es, fr, zh.
    */
  val stopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "les", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和"))
}
