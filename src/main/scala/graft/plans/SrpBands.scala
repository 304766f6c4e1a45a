package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: the banded SRP-LSH signature of a
  * double vector — `bands` keys, each packing `bitsPerBand` sign bits
  * of ⟨v, w_p⟩ against the seeded ±1 hyperplane basis (MSB-first fold,
  * key = Σ bit·2^(w-1-j)).
  *
  * Replaces the composed-expression form
  * `packBands(hyperplaneBits(v, n))`, which at 64 bits × 64 dims builds
  * a ~4096-literal tree (64 `CASE WHEN dot(v, array(64 lits)) >= 0`
  * branches) that costs seconds of Catalyst analysis/folding per plan
  * — a fixed DRIVER cost that showed up as a 5× q_similarity_ann
  * regression when the default bit budget grew. Here the basis lives
  * in one reference object and the whole bands × bits × dim loop runs
  * in a single whole-stage-codegen'd method. Bit-identical to the
  * composed form (same Random(42) basis, same sequential dot order,
  * same MSB-first packing — asserted in SrpBandsSpec).
  *
  * Null vector elements contribute 0 to the dot product (the composed
  * form's VectorDot has no null elements in practice — the ANN surface
  * feeds it cast, non-null embeddings; parity is asserted on that
  * domain). A NULL vector yields a NULL signature (standard unary
  * null propagation), so null-vector rows drop out of banding rather
  * than colliding in an accidental all-zero bucket — a deliberate
  * divergence from the composed form, whose `when(null ≥ 0)` fallback
  * bucketed every null vector at key 0 (spec-pinned).
  */
case class SrpBands(child: Expression, bands: Int, bitsPerBand: Int, dim: Int)
  extends UnaryExpression {

  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 62 && dim > 0,
    "bands, bitsPerBand, and dim must be positive; keys must fit a long" +
      s" (got bands=$bands, bitsPerBand=$bitsPerBand, dim=$dim)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_srp_bands"

  /** Flattened (numBits × dim) ±1 basis, row-major — the same values,
    * in the same generator order, as `Similarity.hyperplanes`. */
  @transient private lazy val basis: Array[Double] =
    SrpBands.basis(bands * bitsPerBand, dim)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bitsPerBand) {
        val p = (b * bitsPerBand + j) * dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) dot += v.getDouble(i) * basis(p + i)
          i += 1
        }
        key = key * 2 + (if (dot >= 0) 1L else 0L)
        j += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val basisRef = ctx.addReferenceObj("srpBasis", basis, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val key = ctx.freshName("key")
      s"""
         |long[] $out = new long[$bands];
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    int $p = ($b * $bitsPerBand + $j) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$v.isNullAt($i)) $dot += $v.getDouble($i) * $basisRef[$p + $i];
         |    }
         |    $key = $key * 2 + ($dot >= 0 ? 1L : 0L);
         |  }
         |  $out[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

object SrpBands {
  /** The seeded ±1 basis, flattened row-major (plane-major, then dim) —
    * generator draw order matches `Similarity.hyperplanes` exactly, so
    * the two forms share buckets bit-for-bit. */
  def basis(numBits: Int, dim: Int): Array[Double] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numBits * dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }
}
