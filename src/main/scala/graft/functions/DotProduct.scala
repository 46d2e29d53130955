package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd sequential dot product over two array<double> OR
  * array<float> columns (element types may differ per side; floats are
  * widened per ELEMENT, which is exact, instead of materializing a
  * casted copy of the whole array).
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.3): Spark's
  * higher-order functions (zip_with/aggregate) are evaluated
  * interpreted, one lambda invocation per element — at 2M candidate
  * pairs × 64 dims that interpretation dominated the embedding-dedup
  * runtime (rewrite-time A/B: ~3.5× from factoring norms, a further
  * ~8× from this codegen loop). doGenCode emits a tight primitive loop that stays inside
  * WholeStageCodegen.
  *
  * Reading array<float> natively matters twice at scale: (a) no
  * per-row (or worse, per-candidate-pair) Cast allocation of a doubled
  * array, and (b) operators can shuffle the raw float column — half
  * the bytes of a pre-cast array<double> — and still dot in double.
  * float→double widening is EXACT, so `(double) a.getFloat(i) *
  * (double) b.getFloat(i)` is bit-identical to casting the arrays to
  * DOUBLE[] first; the DuckDB `list_cosine_similarity(a::DOUBLE[], ...)`
  * oracle hash compare stays exact.
  *
  * Accumulation is sequential in element order — bit-identical to both
  * the zip_with/aggregate formulation and DuckDB's
  * list_cosine_similarity over DOUBLE[].
  *
  * Assumes array elements are non-null (embedding vectors); mismatched
  * lengths dot over the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double> or array<float> (checked at analysis
  // time below — ImplicitCastInputTypes is private[sql], so there is no
  // implicit coercion; callers cast other element types explicitly).
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float> or array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd sequential squared-L2 distance — DotProduct's
  * sibling for the k-means/semantic-dedup assignment loops (r15). Same
  * contract: double accumulation in element order (bit-identical to
  * the zip_with/aggregate fold and to DuckDB's list_reduce), float
  * elements widened per element.
  *
  * Null semantics replicate the HOF form exactly: zip_with pads
  * mismatched lengths with nulls and a null term nulls the whole fold,
  * so mismatched-length inputs yield NULL (DotProduct's
  * common-prefix contract would be wrong here — the HOF consumers
  * treat a length mismatch as "undefined distance").
  */
case class L2SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects array<float> or array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${get(a, left)} - ${get(b, right)};
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqDist =
    copy(left = newLeft, right = newRight)
}
