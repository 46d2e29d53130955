package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd form of the engine's standard 60-bit hash:
  * the first 60 bits of md5(utf8-bytes), value-identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` (parsing the first 15 hex
  * digits base 16) and to DuckDB's
  * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)` — the cross-engine
  * hash contract every sketch operator builds on.
  *
  * Why a custom Expression (SURVEY.md §7.3 ladder): the SQL chain
  * md5 → hex-string → substring → conv allocates three intermediate
  * strings per call and parses digits; this is the single hottest
  * scalar in the library (one call per shingle/token across the whole
  * dedup/text suite). Here the digest runs once into bytes (thread-local
  * MessageDigest, no per-row getInstance) and the 60-bit prefix is
  * assembled with shifts — no hex round-trip. Emitted code is a single
  * static call, so it stays inside WholeStageCodegen.
  *
  * Child must be StringType (enforced at analysis via
  * ExpectsInputTypes, so a mistyped child fails analysis rather than
  * miscompiling); null in → null out.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  // AbstractDataType is sql-private, so the element type is inferred
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Hash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash64 =
    copy(child = newChild)
}

object Md5Hash64 {

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of the digest: bytes 0..6 (14 hex digits) plus the
    * high nibble of byte 7 (the 15th) — exactly the value of the first
    * 15 hex characters parsed base 16. Always non-negative (60 < 63
    * bits).
    */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }
}
