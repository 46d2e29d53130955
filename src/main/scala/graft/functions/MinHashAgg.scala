package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass MinHash signature aggregate (SURVEY.md §4.3's anticipated
  * TypedImperativeAggregate): for each input hash value hv (already
  * reduced mod p), maintains min over rows of (a_i * hv + b_i) mod p
  * for all `params` permutations in ONE mutable long[] buffer.
  *
  * Replaces 128 independent `min(...)` AggregateFunctions: one buffer
  * allocation and one update call per row instead of 128 separate
  * aggregate states, and partial aggregation (map-side combine) still
  * applies — `merge` is elementwise min, so signatures shuffle as
  * NumHashes longs per (doc) group.
  *
  * Arithmetic is identical to the expression formulation (p = 2^31-1
  * keeps products < 2^62), so candidate generation — and therefore the
  * d3 oracle equality — is unchanged.
  */
case class MinHashAgg(
    child: Expression,
    params: Seq[(Long, Long)],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val n = params.length
  private val as: Array[Long] = params.map(_._1).toArray
  private val bs: Array[Long] = params.map(_._2).toArray

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val h = (as(i) * hv + bs(i)) % p
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](n)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}
