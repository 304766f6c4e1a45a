package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the MinHash signature of a hashed
  * shingle set — `numHashes` minima of the universal hash family
  * h_i(x) = (a_i·x32 + b_i) mod P over the input array of 64-bit
  * shingle hashes.
  *
  * This is the engine's one genuinely custom Catalyst piece (SURVEY
  * §7.4): the higher-order-function formulation
  * (`transform(params, p -> array_min(transform(hashes, …)))`) is
  * interpreted per element and allocates an intermediate array per
  * (row × hash function); this expression runs the whole
  * numHashes × |shingles| loop in one tight whole-stage-codegen'd
  * Java method with a single output allocation. Bit-for-bit identical
  * results to the HOF form (same parameters, same arithmetic —
  * asserted in MinHashSigSpec), so LSH bucketing is unchanged.
  *
  * Arithmetic safety: a_i, b_i < 2^31 and the base hash is truncated
  * to its low 32 bits, so a_i·x32 + b_i < 2^63 — the mod is exact,
  * no overflow. P is the classic 2^32+15 prime.
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  import MinHashSig._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val as: Array[Long] = Array.tabulate(numHashes)(aParam)
  @transient private lazy val bs: Array[Long] = Array.tabulate(numHashes)(bParam)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue) // empty-set sentinel signature
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h32 = arr.getLong(i) & 0xFFFFFFFFL
        var j = 0
        while (j < numHashes) {
          val v = (as(j) * h32 + bs(j)) % Prime
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $arr.getLong($i) & 0xFFFFFFFFL;
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${Prime}L;
         |      if ($v < $out[$j]) $out[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** The classic 2^32+15 prime for 32-bit universal hashing. */
  val Prime = 4294967311L
  def aParam(i: Int): Long = ((0x9E3779B1L * (i + 1)) & 0x7FFFFFFFL) | 1L
  def bParam(i: Int): Long = (0x85EBCA77L * (i + 1)) & 0x7FFFFFFFL
}
