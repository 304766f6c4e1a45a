package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: squared Euclidean distance of two
  * array<double> vectors — the inner loop of Lloyd k-means assignment
  * and of every L2-metric similarity operator.
  *
  * Replaces the higher-order-function formulation
  * (`aggregate(zip_with(v, c, (x,y) => (x-y)*(x-y)), 0.0,
  * (s,t) => s+t)`), which is interpreted per ELEMENT — one lambda
  * variable write plus one expression eval per dimension per row, plus
  * a zipped intermediate array allocation per row. Measured on
  * q_embed_kmeans the HOF fold was 2(k−1) evaluations deep per point
  * per pass and dominated the suite (35 s = 17.5%); this expression
  * runs the whole loop in one Java method (same argument as
  * [[VectorDot]], SURVEY §7.4).
  *
  * Numeric parity: the sum is the SAME left-to-right sequential fold
  * as the HOF form — tᵢ = (xᵢ−cᵢ)·(xᵢ−cᵢ) then s += tᵢ ascending from
  * 0.0, every op exact-rounded IEEE — so results are bit-identical to
  * the previous plan and to the DuckDB twin's list_reduce replay;
  * asserted in VectorSqDistSpec.
  *
  * Null semantics mirror the HOF form: a NULL vector, a NULL element,
  * or a length mismatch (zip_with pads with NULL) poisons the sum →
  * NULL out.
  */
case class VectorSqDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sqdist"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSqDist =
    copy(left = newLeft, right = newRight)
}
