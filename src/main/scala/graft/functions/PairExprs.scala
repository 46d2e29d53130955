package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `asc_pairs(ps)`: every ascending index pair of a long array as an
  * array of (pa, pb) structs — the co-purchase pair expansion
  * (Graph.copurchaseEdges) as ONE pass over the backing array
  * (r15 optimization round; the Md5Hash64/ShingleExprs precedent).
  *
  * Replaces the interpreted nested-HOF comprehension
  * `flatten(transform(sequence(0, n-2), i => transform(
  *   sequence(i+1, n-1), j => struct(ps[i+1], ps[j+1]))))` —
  * per order that form allocated two index `sequence` arrays, walked
  * an interpreted lambda per (i, j), built each struct through the
  * expression-tree walk, then copied everything once more through
  * `flatten`. This kernel emits the identical pair list (same values,
  * same (i asc, j asc) order) with one allocation per pair and no
  * intermediates. The input is the per-order sorted part set, so
  * pa < pb by construction, exactly as before.
  *
  * Scale posture: output size is C(n, 2) of the PER-ROW set size —
  * bounded by lines-per-order (TPC-H ≤ 7), never by the corpus.
  */
object PairExprs {
  def ascPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](a, arr.getLong(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class AscPairs(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pa", LongType, nullable = false),
      StructField("pb", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(input: Any): Any =
    PairExprs.ascPairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PairExprs.ascPairs($c)")
  override protected def withNewChildInternal(newChild: Expression): AscPairs =
    copy(child = newChild)
}
