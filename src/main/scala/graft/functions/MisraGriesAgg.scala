package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries frequent-items sketch (Misra & Gries 1982;
  * merge rule per Agarwal et al. 2013, "Mergeable Summaries", PODS —
  * both public) as a Catalyst TypedImperativeAggregate over a string
  * column.
  *
  * State is at most `k` (item, counter) pairs. Update: increment a
  * tracked item, insert untracked while capacity remains, otherwise
  * decrement ALL counters and drop zeros (the classic step — amortized
  * O(1) per row since each decrement pays for k prior inserts). Merge:
  * sum counters pairwise, then subtract the (k+1)-th largest counter
  * from every entry and drop non-positives — the "Mergeable Summaries"
  * rule that preserves the MG error bound under partial aggregation,
  * which is the whole point here: each map task sketches its partition
  * in fixed memory and the shuffle moves ≤ k entries per task instead
  * of the full token distribution. Heavy skew (the exact reason one
  * runs heavy-hitters at 100 TB) therefore cannot blow up the shuffle.
  *
  * GUARANTEE (what the t14 operator builds on): every item with true
  * frequency > n/(k+1) is present in the final sketch — the sketch is
  * a candidate SUPERSET; its counts are undercounts. The consumer
  * re-counts candidates exactly and filters, so approximation never
  * reaches the operator's output (full SQL oracle applies).
  *
  * eval returns the candidate items sorted lexicographically —
  * deterministic output for a deterministic downstream plan.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // decrement-all; drop zeros (no insert this row)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) =>
      b1.update(key, b1.getOrElse(key, 0L) + c)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0
      val cut = b1.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_)))

  // length-prefixed UTF-8 bytes, NOT writeUTF: writeUTF throws on any
  // key whose encoding exceeds 65535 bytes, and a whitespace-free
  // base64/minified blob in dirty web data becomes exactly such a
  // single token — the sketch must survive it, not kill the shuffle
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
