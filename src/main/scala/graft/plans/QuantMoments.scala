package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Per-row quantized moment TERMS of a dense array<double> vector, as
  * one flat array<long>: the n linear terms `floor(xᵢ·scale + 0.5)`
  * followed by the n(n+1)/2 upper-triangle product terms
  * `floor((xᵢ·xⱼ)·scale + 0.5)` for i ≤ j in (i asc, j asc) order —
  * exactly the integer grid [[graft.operators.Similarity.pcaTopComponent]]
  * sums for its covariance assembly.
  *
  * Replaces (with [[LongVecSum]]) the posexplode/struct-explode +
  * 4M-row hash-aggregate moments pass: the HOF form built a struct
  * per (i,j) term via nested transform/slice (one array copy per
  * outer element per row) and shuffled every term as a row; this
  * expression runs the whole O(d²) loop inside one codegen'd method
  * with a single long-array allocation per row, and the aggregate
  * ships ONE array per partition (guide §2.3/§2.4: aggregate before
  * you shuffle; shuffle counts, not rows).
  *
  * Numeric parity: each term is the identical IEEE chain
  * ((xᵢ·xⱼ)·scale + 0.5 → Math.floor → long cast) the Floor/Multiply
  * expression tree evaluated, and integer sums are order-free, so
  * every downstream digit is bit-identical (pinned in
  * QuantMomentsSpec). NULL semantics mirror the tree form: a NULL
  * vector yields NULL (row ignored by aggregates); a NULL element
  * NULLs exactly the terms that referenced it. */
case class QuantMomentTerms(child: Expression, scale: Double)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quant_moment_terms"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n + n * (n + 1) / 2)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.lang.Long.valueOf(
          math.floor(a.getDouble(i) * scale + 0.5).toLong)
      i += 1
    }
    var k = n
    i = 0
    while (i < n) {
      if (a.isNullAt(i)) k += n - i
      else {
        val xi = a.getDouble(i)
        var j = i
        while (j < n) {
          if (!a.isNullAt(j))
            out(k) = java.lang.Long.valueOf(
              math.floor(xi * a.getDouble(j) * scale + 0.5).toLong)
          j += 1
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xi = ctx.freshName("xi")
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n + $n * ($n + 1) / 2];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = Long.valueOf(
         |      (long) Math.floor($a.getDouble($i) * $scale + 0.5));
         |  }
         |}
         |int $k = $n;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $k += $n - $i; continue; }
         |  double $xi = $a.getDouble($i);
         |  for (int $j = $i; $j < $n; $j++, $k++) {
         |    if (!$a.isNullAt($j)) {
         |      $out[$k] = Long.valueOf(
         |        (long) Math.floor($xi * $a.getDouble($j) * $scale + 0.5));
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantMomentTerms =
    copy(child = newChild)
}

/** Elementwise SUM aggregate over array<long> rows — the reduction
  * half of the fused moments pass (and of any fixed-width quantized
  * moment table): buffer = (sums, seen-counts) per position, merge is
  * elementwise add, eval emits NULL at positions no row contributed
  * to — exactly `sum(term)`'s all-NULL → NULL contract, so the fused
  * plan and the explode/groupBy tree agree on every position
  * (pinned in QuantMomentsSpec).
  *
  * NULL rows are ignored (sum semantics); a NULL element leaves its
  * position untouched; ragged lengths fail LOUDLY (the caller
  * pre-flights dimensions — silent truncation would corrupt moments).
  */
case class LongVecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVecSum.Buf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_longvec_sum"

  override def createAggregationBuffer(): LongVecSum.Buf = new LongVecSum.Buf

  override def update(buf: LongVecSum.Buf, input: InternalRow): LongVecSum.Buf = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (buf.sums == null) {
      buf.sums = new Array[Long](n)
      buf.seen = new Array[Long](n)
    } else require(buf.sums.length == n,
      s"$prettyName: ragged input lengths ${buf.sums.length} vs $n")
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        buf.sums(i) += a.getLong(i)
        buf.seen(i) += 1L
      }
      i += 1
    }
    buf
  }

  override def merge(b1: LongVecSum.Buf, b2: LongVecSum.Buf): LongVecSum.Buf = {
    if (b2.sums == null) return b1
    if (b1.sums == null) { b1.sums = b2.sums; b1.seen = b2.seen; return b1 }
    require(b1.sums.length == b2.sums.length,
      s"$prettyName: ragged partial lengths ${b1.sums.length} vs ${b2.sums.length}")
    var i = 0
    while (i < b1.sums.length) {
      b1.sums(i) += b2.sums(i)
      b1.seen(i) += b2.seen(i)
      i += 1
    }
    b1
  }

  override def eval(buf: LongVecSum.Buf): Any = {
    if (buf.sums == null) return null
    val out = new Array[Any](buf.sums.length)
    var i = 0
    while (i < out.length) {
      if (buf.seen(i) > 0) out(i) = java.lang.Long.valueOf(buf.sums(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: LongVecSum.Buf): Array[Byte] = {
    val n = if (buf.sums == null) -1 else buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + math.max(0, n) * 16)
    bb.putInt(n)
    if (n >= 0) {
      var i = 0
      while (i < n) { bb.putLong(buf.sums(i)); bb.putLong(buf.seen(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVecSum.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new LongVecSum.Buf
    if (n >= 0) {
      buf.sums = new Array[Long](n)
      buf.seen = new Array[Long](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getLong; buf.seen(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVecSum =
    copy(child = newChildren.head)
}

object LongVecSum {
  /** Mutable (sums, seen-counts) pair; null arrays until the first
    * non-null input row fixes the width. */
  final class Buf {
    var sums: Array[Long] = _
    var seen: Array[Long] = _
  }
}
