package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the dedup/text tier's tokenize/shingle
  * contract (r15 optimization round — the Md5Hash64/ByteplaneExprs
  * precedent applied to the d-family's hottest scans).
  *
  * The shingle pipeline was built from higher-order functions:
  * `filter(split(lower(text), "\\s+"), …)` → `transform(sequence(…),
  * i => concat_ws(" ", element_at(w, i+1), …))` → `array_distinct` →
  * `transform(shs, g => hash64(g))`. HOF lambdas are interpreted per
  * element (no whole-stage codegen), and every stage allocates
  * intermediate UTF8Strings — per doc that is several interpreted
  * expression-tree walks per token plus one md5 over a freshly
  * concatenated gram string. Guide §1.2 step 2 (per-task work): each
  * kernel below runs the whole chain as one tight JVM loop over the
  * document's UTF-8 bytes, allocating only the output. Every kernel is
  * value-identical to the HOF tree it replaces — ShingleExprsSpec pins
  * each against the original formulation (kept verbatim there as the
  * executable reference), and the DuckDB hash oracles are unchanged.
  *
  * Tokenization contract (== split(lower(t), "\\s+") with empties
  * dropped): Java regex \s matches exactly {0x09, 0x0A, 0x0B, 0x0C,
  * 0x0D, 0x20} — all single-byte in UTF-8, and those byte values never
  * occur inside a multi-byte sequence, so maximal runs of
  * non-whitespace BYTES over the lowercased text are exactly the regex
  * split's non-empty tokens for ANY input, not just ASCII. Lowercasing
  * is `UTF8String.toLowerCase` — the method Spark's `lower` evaluates
  * under the default UTF8_BINARY collation.
  *
  * Hash contract: gram hash = Md5Hash64 (first 60 bits of md5) over
  * the gram's UTF-8 bytes, fed to the digest as token slices joined by
  * 0x20 — byte-identical to md5 of concat_ws(" ", …) without building
  * the gram string. Set distinctness is decided on the FULL 128-bit
  * digest (strictly finer than the 60-bit value that leaves the
  * kernel, and equal to the old string-keyed array_distinct short of
  * an md5 collision); first-occurrence order is preserved, exactly as
  * array_distinct keeps it.
  */
object ShingleExprs {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Token byte-ranges of `b`: flat [s0,e0, s1,e1, …] and the count. */
  private def tokenRangesOf(b: Array[Byte]): (Array[Int], Int) = {
    var out = new Array[Int](32)
    var n = 0
    var i = 0
    while (i < b.length) {
      while (i < b.length && isWs(b(i))) i += 1
      if (i < b.length) {
        val s = i
        while (i < b.length && !isWs(b(i))) i += 1
        if (n + 2 > out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        out(n) = s; out(n + 1) = i; n += 2
      }
    }
    (out, n / 2)
  }

  /** Open-addressing set over 128-bit md5 digests (two parallel long
    * arrays; md5 bits are uniform so `hi` is its own hash). The
    * all-zero digest collides with the empty-slot sentinel and gets a
    * dedicated flag — exactness does not ride on 2^-128 luck.
    */
  private final class DigestSet(expected: Int) {
    private var cap = Integer.highestOneBit(math.max(8, expected * 2) - 1) * 2
    private var his = new Array[Long](cap)
    private var los = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    private var zeroSeen = false

    /** true if (hi, lo) was absent (and is now added). */
    def add(hi: Long, lo: Long): Boolean = {
      if (hi == 0L && lo == 0L) {
        if (zeroSeen) return false
        zeroSeen = true; return true
      }
      if ((n + 1) * 4 > cap * 3) grow()
      var idx = (hi ^ (hi >>> 32)).toInt & (cap - 1)
      while (used(idx)) {
        if (his(idx) == hi && los(idx) == lo) return false
        idx = (idx + 1) & (cap - 1)
      }
      used(idx) = true; his(idx) = hi; los(idx) = lo; n += 1
      true
    }

    private def grow(): Unit = {
      val oh = his; val ol = los; val ou = used; val oc = cap
      cap *= 2
      his = new Array[Long](cap); los = new Array[Long](cap)
      used = new Array[Boolean](cap); n = 0
      var i = 0
      while (i < oc) {
        if (ou(i)) {
          var idx = (oh(i) ^ (oh(i) >>> 32)).toInt & (cap - 1)
          while (used(idx)) idx = (idx + 1) & (cap - 1)
          used(idx) = true; his(idx) = oh(i); los(idx) = ol(i); n += 1
        }
        i += 1
      }
    }
  }

  /** First 60 bits of an md5 digest — the Md5Hash64 value. */
  private def hash60(dig: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }

  private def digestHi(dig: Array[Byte]): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v
  }

  private def digestLo(dig: Array[Byte]): Long = {
    var v = 0L; var i = 8
    while (i < 16) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v
  }

  private val emptyArray = new GenericArrayData(Array.empty[Any])

  // ── kernels (public: called from generated code) ────────────────────

  def tokensLower(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val (r, n) = tokenRangesOf(b)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromBytes(b, r(2 * i), r(2 * i + 1) - r(2 * i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct hashed word n-gram shingles — the docShingles chain. */
  def wordShingles64(s: UTF8String, n: Int): ArrayData = {
    val b = s.toLowerCase.getBytes
    val (r, nTok) = tokenRangesOf(b)
    if (nTok < n) return emptyArray
    val d = md.get()
    val nGrams = nTok - n + 1
    val seen = new DigestSet(nGrams)
    val out = new java.util.ArrayList[Any](nGrams)
    var i = 0
    while (i < nGrams) {
      d.reset()
      var j = 0
      while (j < n) {
        if (j > 0) d.update(0x20.toByte)
        val t = 2 * (i + j)
        d.update(b, r(t), r(t + 1) - r(t))
        j += 1
      }
      val dig = d.digest()
      if (seen.add(digestHi(dig), digestLo(dig))) out.add(hash60(dig))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct word n-gram shingle STRINGS (the docShinglesCached
    * chain: tokens → n-grams → array_distinct, un-hashed — the
    * CorpusOps contamination tier joins on gram strings and d14
    * xxhashes them, so string identity is part of that contract).
    * Distinctness is exact string equality (UTF8String), first
    * occurrence first.
    */
  def wordShingleStrs(s: UTF8String, n: Int): ArrayData = {
    val b = s.toLowerCase.getBytes
    val (r, nTok) = tokenRangesOf(b)
    if (nTok < n) return emptyArray
    val nGrams = nTok - n + 1
    val seen = new java.util.HashSet[UTF8String](nGrams * 2)
    val out = new java.util.ArrayList[Any](nGrams)
    var i = 0
    while (i < nGrams) {
      var len = n - 1
      var j = 0
      while (j < n) { len += r(2 * (i + j) + 1) - r(2 * (i + j)); j += 1 }
      val g = new Array[Byte](len)
      var pos = 0
      j = 0
      while (j < n) {
        if (j > 0) { g(pos) = 0x20; pos += 1 }
        val t = 2 * (i + j)
        val tl = r(t + 1) - r(t)
        System.arraycopy(b, r(t), g, pos, tl)
        pos += tl
        j += 1
      }
      val u = UTF8String.fromBytes(g)
      if (seen.add(u)) out.add(u)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct hashed char n-gram shingles of an (already normalized)
    * string — the docCharShingles gram+hash chain. Gram boundaries are
    * CODE POINTS (UTF-8 leading bytes), matching substr's indexing.
    */
  def charShingles64(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val offs = codePointOffsets(b)
    val nChars = offs.length - 1
    if (nChars < n) return emptyArray
    val d = md.get()
    val nGrams = nChars - n + 1
    val seen = new DigestSet(nGrams)
    val out = new java.util.ArrayList[Any](nGrams)
    var i = 0
    while (i < nGrams) {
      d.reset()
      d.update(b, offs(i), offs(i + n) - offs(i))
      val dig = d.digest()
      if (seen.add(digestHi(dig), digestLo(dig))) out.add(hash60(dig))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Byte offset of each code point plus a final end-offset sentinel. */
  private def codePointOffsets(b: Array[Byte]): Array[Int] = {
    var out = new Array[Int](math.max(8, b.length + 1))
    var n = 0
    var i = 0
    while (i < b.length) {
      out(n) = i; n += 1
      val first = b(i) & 0xff
      i += (if (first < 0x80) 1
            else if (first < 0xE0) 2
            else if (first < 0xF0) 3
            else 4)
    }
    if (n + 1 > out.length) out = java.util.Arrays.copyOf(out, n + 1)
    out(n) = b.length
    java.util.Arrays.copyOf(out, n + 1)
  }

  /** MinHash signature of a pre-hashed shingle array: for each of the
    * `as.length` permutations, min over shingles of (a·(g mod p)+b)
    * mod p — arithmetically identical to MinHashAgg / the signDocs HOF
    * form. Empty input yields the agg's initial buffer (all
    * Long.MaxValue); callers filter sz > 0 exactly as the explode form
    * dropped shingle-less docs.
    */
  def minhashSig(sh: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val k = as.length
    val buf = new Array[Long](k)
    java.util.Arrays.fill(buf, Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val g = sh.getLong(i)
      val hv = g % p // g is a 60-bit non-negative hash: pmod == %
      var j = 0
      while (j < k) {
        val h = (as(j) * hv + bs(j)) % p
        if (h < buf(j)) buf(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(buf.map(_.asInstanceOf[Any]))
  }

  /** Winnowing fingerprints (d32): ordered k-gram md5-60 hashes over
    * the token sequence (NO distinct — winnowing is positional), then
    * the distinct set of sliding-window(w) minima, first occurrence
    * first. Docs with fewer than k+w-1 tokens yield an empty array
    * (the caller's explode emits nothing — same as the old
    * size-filter).
    */
  def winnowFps64(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = s.toLowerCase.getBytes
    val (r, nTok) = tokenRangesOf(b)
    if (nTok < k + w - 1) return emptyArray
    val d = md.get()
    val nGrams = nTok - k + 1
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      d.reset()
      var j = 0
      while (j < k) {
        if (j > 0) d.update(0x20.toByte)
        val t = 2 * (i + j)
        d.update(b, r(t), r(t + 1) - r(t))
        j += 1
      }
      h(i) = hash60(d.digest())
      i += 1
    }
    val nWin = nGrams - w + 1
    val seen = new java.util.HashSet[java.lang.Long](nWin * 2)
    val out = new java.util.ArrayList[Any](nWin)
    i = 0
    while (i < nWin) {
      var m = h(i)
      var j = 1
      while (j < w) { if (h(i + j) < m) m = h(i + j); j += 1 }
      if (seen.add(m)) out.add(m)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Content-defined chunks (d34): boundary after code point i
    * (1-based, i ≥ w) iff the polynomial rolling hash of the trailing
    * w-code-point window ≡ 0 mod m; chunks are the code-point spans
    * between boundaries. Identical integer arithmetic to the HOF fold
    * (acc·B + c mod P starting at 0), identical span semantics
    * (ss = 0::bnd, ee = bnd::[n], e > s).
    */
  def cdcChunks(s: UTF8String, w: Int, m: Int, rollB: Long, rollP: Long): ArrayData = {
    val b = s.getBytes
    val offs = codePointOffsets(b)
    val n = offs.length - 1
    if (n == 0) return emptyArray
    // code point values (== ascii() of each split("") element)
    val codes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val first = b(offs(i)) & 0xff
      codes(i) =
        if (first < 0x80) first
        else {
          var cp = 0
          var j = offs(i)
          val e = offs(i + 1)
          cp = first & (if (first < 0xE0) 0x1F else if (first < 0xF0) 0x0F else 0x07)
          j += 1
          while (j < e) { cp = (cp << 6) | (b(j) & 0x3F); j += 1 }
          cp
        }
      i += 1
    }
    val out = new java.util.ArrayList[Any](4)
    var start = 0
    i = w // boundary candidates: 1-based i in [w, n] → window [i-w, i)
    while (i <= n) {
      var acc = 0L
      var j = i - w
      while (j < i) { acc = (acc * rollB + codes(j)) % rollP; j += 1 }
      if (acc % m == 0L) {
        if (i > start) // e > s
          out.add(UTF8String.fromBytes(b, offs(start), offs(i) - offs(start)))
        start = i
      }
      i += 1
    }
    if (n > start)
      out.add(UTF8String.fromBytes(b, offs(start), b.length - offs(start)))
    new GenericArrayData(out.toArray)
  }

  /** The BPE wrap (t29/t35): every code point of `s` wrapped in the
    * \\u0001…\\u0002 open/close markers — byte-identical to
    * concat(A, array_join(filter(split(s, "")), B+A), B) in one pass
    * (A c₁ (B A) c₂ … cₙ B ≡ per-char A cᵢ B concatenated).
    */
  def wrapSyms(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val offs = codePointOffsets(b)
    val n = offs.length - 1
    if (n == 0) return UTF8String.fromBytes(Array[Byte](0x01, 0x02))
    val out = new Array[Byte](b.length + 2 * n)
    var pos = 0
    var i = 0
    while (i < n) {
      out(pos) = 0x01; pos += 1
      val len = offs(i + 1) - offs(i)
      System.arraycopy(b, offs(i), out, pos, len)
      pos += len
      out(pos) = 0x02; pos += 1
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** d29's positional gram hashes: xxhash64(seed 42) of each q-code-
    * point gram of the (already normalized) text, in position order.
    * Empty for texts shorter than q (the caller's len filter keeps the
    * old behavior anyway).
    */
  def posGramsXx64(s: UTF8String, q: Int): ArrayData = {
    val b = s.getBytes
    val offs = codePointOffsets(b)
    val n = offs.length - 1
    if (n < q) return emptyArray
    val out = new Array[Any](n - q + 1)
    var i = 0
    while (i <= n - q) {
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + offs(i),
        offs(i + q) - offs(i), 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

// ── Expression wrappers ───────────────────────────────────────────────

/** Base for the string→array kernels above: null-intolerant unary
  * expression whose generated code is a single static call (stays
  * inside WholeStageCodegen, like Md5Hash64).
  */
abstract class StringKernelExpr extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  protected def call: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleExprs.$call($c)")
}

/** tokens(text): non-empty lowercased whitespace tokens. */
case class TokensLower(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.tokensLower(input.asInstanceOf[UTF8String])
  override protected def call = "tokensLower"
  override protected def withNewChildInternal(newChild: Expression): TokensLower =
    copy(child = newChild)
}

/** Distinct word n-gram shingle strings (un-hashed). */
case class WordShingleStrs(child: Expression, n: Int) extends StringKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.wordShingleStrs(input.asInstanceOf[UTF8String], n)
  override protected def call = "wordShingleStrs"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleExprs.wordShingleStrs($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingleStrs =
    copy(child = newChild)
}

/** Distinct hashed word n-gram shingles. */
case class WordShingles64(child: Expression, n: Int) extends StringKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.wordShingles64(input.asInstanceOf[UTF8String], n)
  override protected def call = s"wordShingles64"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleExprs.wordShingles64($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles64 =
    copy(child = newChild)
}

/** Distinct hashed char n-gram shingles of a normalized string. */
case class CharShingles64(child: Expression, n: Int) extends StringKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.charShingles64(input.asInstanceOf[UTF8String], n)
  override protected def call = "charShingles64"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleExprs.charShingles64($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharShingles64 =
    copy(child = newChild)
}

/** Winnowing fingerprint set (see ShingleExprs.winnowFps64). */
case class WinnowFps64(child: Expression, k: Int, w: Int) extends StringKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.winnowFps64(input.asInstanceOf[UTF8String], k, w)
  override protected def call = "winnowFps64"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleExprs.winnowFps64($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFps64 =
    copy(child = newChild)
}

/** Content-defined chunks (see ShingleExprs.cdcChunks). */
case class CdcChunkArr(child: Expression, w: Int, m: Int, rollB: Long, rollP: Long)
    extends StringKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.cdcChunks(input.asInstanceOf[UTF8String], w, m, rollB, rollP)
  override protected def call = "cdcChunks"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleExprs.cdcChunks($c, $w, $m, ${rollB}L, ${rollP}L)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunkArr =
    copy(child = newChild)
}

/** BPE per-symbol marker wrap (see ShingleExprs.wrapSyms). */
case class WrapSyms(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.wrapSyms(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleExprs.wrapSyms($c)")
  override protected def withNewChildInternal(newChild: Expression): WrapSyms =
    copy(child = newChild)
}

/** Positional xxhash64 q-gram array (see ShingleExprs.posGramsXx64). */
case class PosGramsXx64(child: Expression, q: Int) extends StringKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    ShingleExprs.posGramsXx64(input.asInstanceOf[UTF8String], q)
  override protected def call = "posGramsXx64"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleExprs.posGramsXx64($c, $q)")
  override protected def withNewChildInternal(newChild: Expression): PosGramsXx64 =
    copy(child = newChild)
}

/** MinHash signature of a pre-hashed shingle array (array<long> →
  * array<long>[params.length]) — the projection form of MinHashAgg:
  * one tight loop per doc instead of explode → partial agg → exchange
  * → final agg (guide §2.4: the whole shuffle is removed, since the
  * signature is a per-row function of the already-materialized shingle
  * set).
  */
case class MinHashSig(child: Expression, params: Seq[(Long, Long)], p: Long)
    extends UnaryExpression with ExpectsInputTypes {
  private lazy val as: Array[Long] = params.map(_._1).toArray
  private lazy val bs: Array[Long] = params.map(_._2).toArray

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleExprs.minhashSig(input.asInstanceOf[ArrayData], as, bs, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleExprs.minhashSig($c, $asRef, $bsRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
