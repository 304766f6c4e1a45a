package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: `key ∈ bloom(dim keys)` as a codegen'd
  * sketch probe — the engine's explicit form of runtime row-level
  * filtering (what Spark's own `runtimeFilter.bloomFilter` rewrite
  * injects automatically for eligible shuffle joins).
  *
  * The filter rides the plan as a reference object (a few hundred KB
  * of bits for millions of keys at 1% fpp — vs a broadcast hash
  * relation carrying the key ROWS), and the probe runs inside the
  * scan's whole-stage-codegen loop BEFORE any exchange: at 100 TB the
  * fact rows that cannot join never enter the shuffle at all. The
  * probe is one-sided — `true` may be a false positive (bounded by
  * fpp), `false` is exact — so callers must re-verify survivors with
  * an exact join; [[graft.operators.Joins.bloomSemiJoin]] composes
  * both halves. NULL keys yield NULL (dropped by Filter), exactly as
  * a null-rejecting join key drops the row.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bf = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($v);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
