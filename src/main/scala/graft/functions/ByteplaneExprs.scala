package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the m-family's byte-plane contract
  * (SURVEY.md §7.3 ladder — the Md5Hash64/DotProduct precedent applied
  * to the multimodal scans, r15 optimization round).
  *
  * The m-operators' sample plane was derived as
  * `transform(split(text, ""), c => ascii(c))`: per document that
  * allocates one single-char UTF8String per character (regex split),
  * then evaluates an interpreted lambda per element — higher-order
  * functions are NOT whole-stage-codegen'd, so every element pays an
  * expression-tree walk plus boxing. At sf0.1 (5 000 docs × ~300
  * chars) the m12 DCT chain alone evaluated ~1.5M interpreted
  * `aggregate` folds per pass; guide §1.2 step 2 (per-task work) and
  * §4's "prefer codegen expressions over interpreted per-element
  * evaluation" both point at replacing the per-element interpretation
  * with tight JVM loops. Each kernel below is value-identical to the
  * HOF tree it replaces (spec-pinned in ByteplaneExprsSpec property
  * tests; the DuckDB hash oracles are unchanged and stay green).
  *
  * Char semantics contract (identical to split+ascii on the corpora
  * this engine ingests): one sample per UTF-16 code unit, value =
  * `String.charAt` — equal to `ascii()` of the single-char string for
  * every non-surrogate BMP character. ASCII text (the entire corpus;
  * checked at all SFs) takes the byte fast path. Supplementary-plane
  * text is degenerate under BOTH forms (split("") severs surrogate
  * pairs and UTF-8 re-encoding of a lone surrogate is lossy), so the
  * contract is explicitly BMP — same caveat the HOF form silently
  * carried.
  */
object ByteplaneExprs {

  /** UTF-16 code-unit values of `s` as an int array. */
  def charCodes(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) {
      val out = new Array[Int](bytes.length)
      i = 0
      while (i < bytes.length) { out(i) = bytes(i); i += 1 }
      out
    } else {
      val str = s.toString
      val out = new Array[Int](str.length)
      i = 0
      while (i < str.length) { out(i) = str.charAt(i); i += 1 }
      out
    }
  }

  def asciiCodes(s: UTF8String): ArrayData =
    new GenericArrayData(charCodes(s).map(_.asInstanceOf[Any]))

  // ── m12 DCT perceptual hash ────────────────────────────────────────

  /** Per-(side, block) fixed-point DCT matrix cache — tiny (one entry
    * in practice), computed once per JVM. Values identical to
    * Multimodal.dctMatrix (same formula, same rounding). */
  private val dctCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Long]]()

  private def dctMatrix(side: Int, block: Int): Array[Long] =
    dctCache.computeIfAbsent((side, block), { case (s, b) =>
      val m = new Array[Long](b * s)
      var u = 0
      while (u < b) {
        val alpha = if (u == 0) math.sqrt(1.0 / s) else math.sqrt(2.0 / s)
        var x = 0
        while (x < s) {
          m(u * s + x) = math.round(
            alpha * math.cos(math.Pi * (2 * x + 1) * u / (2.0 * s)) * 16384L)
          x += 1
        }
        u += 1
      }
      m
    })

  /** The m12 pipeline in one pass: row DCT (A = M·P), column DCT
    * (C = A·Mᵀ), exact median of the 63 non-DC coefficients (the
    * 32nd-smallest order statistic), bit k−1 set iff coefficient k
    * strictly exceeds it. Identical integer arithmetic to the HOF
    * tree in Multimodal.dctHashFrom (which now delegates here);
    * callers guarantee numChars ≥ side². */
  def dctPhash(s: UTF8String, side: Int, block: Int): Long = {
    val m = dctMatrix(side, block)
    val p = charCodes(s)
    // row pass: a(u, c) = Σ_r M(u, r) · p(r, c)
    val a = new Array[Long](block * side)
    var u = 0
    while (u < block) {
      var c = 0
      while (c < side) {
        var acc = 0L
        var r = 0
        while (r < side) {
          acc += m(u * side + r) * p(r * side + c)
          r += 1
        }
        a(u * side + c) = acc
        c += 1
      }
      u += 1
    }
    // column pass: cf(u, v) = Σ_c a(u, c) · M(v, c)
    val nCf = block * block
    val cf = new Array[Long](nCf)
    u = 0
    while (u < block) {
      var v = 0
      while (v < block) {
        var acc = 0L
        var c = 0
        while (c < side) {
          acc += a(u * side + c) * m(v * side + c)
          c += 1
        }
        cf(u * block + v) = acc
        v += 1
      }
      u += 1
    }
    // median of the non-DC coefficients = (nCf/2)-th smallest (1-based)
    // of cf[1..nCf-1] — exact order statistic, same as the HOF's
    // element_at(array_sort(slice(cf, 2, nCf − 1)), nCf / 2)
    val sorted = java.util.Arrays.copyOfRange(cf, 1, nCf)
    java.util.Arrays.sort(sorted)
    val med = sorted(nCf / 2 - 1)
    var bits = 0L
    var k = 1
    while (k < nCf) {
      if (cf(k) > med) bits |= 1L << (k - 1)
      k += 1
    }
    bits
  }

  /** The m14 per-document char-histogram statistics in one pass:
    * (n_distinct, mode_count, Σc²) over per-char-value counts —
    * value-identical to exploding one row per char and aggregating
    * count(1) per (doc, value). */
  def charStats(s: UTF8String): InternalRow = {
    val p = charCodes(s)
    // per-value counts via sort (values are char codes; p.length is
    // document-sized, sort beats a 64K histogram on short docs)
    java.util.Arrays.sort(p)
    var distinct = 0L
    var mode = 0L
    var sumC2 = 0L
    var i = 0
    while (i < p.length) {
      var j = i + 1
      while (j < p.length && p(j) == p(i)) j += 1
      val c = (j - i).toLong
      distinct += 1
      if (c > mode) mode = c
      sumC2 += c * c
      i = j
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](distinct, mode, sumC2))
  }

  // ── r15 frame-fold kernels (m6/m9/m10) ─────────────────────────────
  // Each replaces `aggregate(slice(samples, start, len), 0L, fold)` —
  // an interpreted per-element lambda plus a slice allocation per
  // frame — with one bounds-clamped loop over the backing array.
  // Slice semantics preserved: 1-based `start`, end clamped to the
  // array length (frames here are always full-width, but the clamp
  // keeps the kernel total). Σx² runs in long arithmetic: the HOF
  // form multiplied int×int (which ANSI-throws beyond ±46340 — never
  // reachable under the BMP byte-plane contract, char codes < 2^16
  // only via the long path), value-equal wherever the original
  // evaluates.

  def sliceSum(arr: ArrayData, start: Int, len: Int): Long = {
    val n = arr.numElements()
    var i = math.max(0, start - 1)
    val end = math.min(n, start - 1 + len)
    var s = 0L
    while (i < end) { s += arr.getInt(i); i += 1 }
    s
  }

  def sliceSumSq(arr: ArrayData, start: Int, len: Int): Long = {
    val n = arr.numElements()
    var i = math.max(0, start - 1)
    val end = math.min(n, start - 1 + len)
    var s = 0L
    while (i < end) { val x = arr.getInt(i).toLong; s += x * x; i += 1 }
    s
  }

  /** array_max over the slice — null (boxed) for an empty slice, as
    * array_max is. */
  def sliceMax(arr: ArrayData, start: Int, len: Int): Any = {
    val n = arr.numElements()
    var i = math.max(0, start - 1)
    val end = math.min(n, start - 1 + len)
    if (i >= end) return null
    var m = arr.getInt(i); i += 1
    while (i < end) { val x = arr.getInt(i); if (x > m) m = x; i += 1 }
    m
  }

  /** m9's banded signature in one pass: st = Σ frame, band b of
    * `bits` equal sub-slices sets bit b iff bandSum·bits > st —
    * identical integer arithmetic to the 1 + `bits` unrolled
    * slice-aggregates it replaces. */
  def bandedSig(arr: ArrayData, start: Int, width: Int, bits: Int): Long = {
    val sub = width / bits
    val n = arr.numElements()
    val base = start - 1
    var st = 0L
    var i = math.max(0, base)
    val end = math.min(n, base + width)
    while (i < end) { st += arr.getInt(i); i += 1 }
    var sig = 0L
    var b = 0
    while (b < bits) {
      var sb = 0L
      var j = math.max(0, base + b * sub)
      val e = math.min(n, base + b * sub + sub)
      while (j < e) { sb += arr.getInt(j); j += 1 }
      if (sb * bits > st) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** `ascii_codes(text)`: the byte-plane sample array (one int per
  * UTF-16 code unit) as a single codegen'd pass — replaces
  * `transform(split(text, ""), c => ascii(c))` (and the
  * empty-filtered variant, which it equals because no empty strings
  * are ever emitted). See ByteplaneExprs for the contract. */
case class AsciiCodes(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ByteplaneExprs.asciiCodes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ByteplaneExprs.asciiCodes($c)")
  override protected def withNewChildInternal(newChild: Expression): AsciiCodes =
    copy(child = newChild)
}

/** `DctPhash64(text)`: the m12 DCT perceptual hash (63-bit long) as a
  * single codegen'd pass. Callers must pre-filter numChars ≥ side²
  * (the m12 length filter — same contract the HOF tree had). */
case class DctPhash64(child: Expression, side: Int = 16, block: Int = 8)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ByteplaneExprs.dctPhash(input.asInstanceOf[UTF8String], side, block)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ByteplaneExprs.dctPhash($c, $side, $block)")
  override protected def withNewChildInternal(newChild: Expression): DctPhash64 =
    copy(child = newChild)
}

/** `CharStats(text)`: the m14 per-document histogram statistics
  * struct(n_distinct_bytes, mode_count, sum_c2) as one codegen'd pass
  * — replaces the explode → count-per-(doc, value) → per-doc rollup
  * (two shuffles) with a shuffle-free projection. */
case class CharStats(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct_bytes", LongType, nullable = false),
    StructField("mode_count", LongType, nullable = false),
    StructField("sum_c2", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    ByteplaneExprs.charStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ByteplaneExprs.charStats($c)")
  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

/** Frame-fold kernels over (samples, start): one clamped loop instead
  * of `aggregate(slice(...))` — see ByteplaneExprs.sliceSum*. The
  * slice length / band count are plan-time literals.
  */
case class SliceSumLong(left: Expression, right: Expression, len: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(arr: Any, start: Any): Any =
    ByteplaneExprs.sliceSum(arr.asInstanceOf[ArrayData],
      start.asInstanceOf[Int], len)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) =>
      s"graft.functions.ByteplaneExprs.sliceSum($a, $s, $len)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SliceSumLong =
    copy(left = newLeft, right = newRight)
}

case class SliceSumSqLong(left: Expression, right: Expression, len: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(arr: Any, start: Any): Any =
    ByteplaneExprs.sliceSumSq(arr.asInstanceOf[ArrayData],
      start.asInstanceOf[Int], len)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) =>
      s"graft.functions.ByteplaneExprs.sliceSumSq($a, $s, $len)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SliceSumSqLong =
    copy(left = newLeft, right = newRight)
}

/** array_max over the slice (null on an empty slice, as array_max). */
case class SliceMaxInt(left: Expression, right: Expression, len: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(arr: Any, start: Any): Any =
    ByteplaneExprs.sliceMax(arr.asInstanceOf[ArrayData],
      start.asInstanceOf[Int], len)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.ByteplaneExprs.sliceMax"
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"""
         |Object r = $f($a, $s, $len);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Integer) r).intValue(); }
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SliceMaxInt =
    copy(left = newLeft, right = newRight)
}

/** m9's banded frame signature (see ByteplaneExprs.bandedSig). */
case class BandedSig(left: Expression, right: Expression, width: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(IntegerType), IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(arr: Any, start: Any): Any =
    ByteplaneExprs.bandedSig(arr.asInstanceOf[ArrayData],
      start.asInstanceOf[Int], width, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) =>
      s"graft.functions.ByteplaneExprs.bandedSig($a, $s, $width, $bits)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BandedSig =
    copy(left = newLeft, right = newRight)
}
