package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all `b` deterministic Poisson(1)
  * bootstrap weights of one row in a single loop — w_r inverted from
  * the sha-256("<rid>:<salt>:<r>") uniform exactly as the column-tree
  * form spells it (`conv(substring(sha2(concat(...)), 1, 8), 16, 10)
  * / 2^32` against the shared e⁻¹ CDF cut points), so every weight —
  * and every oracle-hashed digit downstream — is bit-identical.
  *
  * What the fused loop removes vs. B separate sha2 columns: the
  * 64-char hex render of each 32-byte digest (only digest bytes 0–3
  * are ever read — the first 8 hex chars), the substring + base-16
  * string parse, B UTF8String concats of the full key (the rid and
  * ":salt:" bytes are hashed straight from reusable buffers; only the
  * replicate suffix varies), and the B-expression projection tree.
  * One output allocation per row; stays inside whole-stage codegen
  * via a static call (the MinHashSig posture, SURVEY §7.4).
  */
case class BootstrapDraws(child: Expression, salt: String, b: Int)
  extends UnaryExpression {

  require(b >= 1 && b <= 100000, s"replicate count out of range: $b")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bootstrap_draws"

  @transient private lazy val mid: Array[Byte] =
    s":$salt:".getBytes(java.nio.charset.StandardCharsets.UTF_8)
  @transient private lazy val repBytes: Array[Array[Byte]] =
    Array.tabulate(b)(r =>
      r.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def nullSafeEval(input: Any): Any =
    BootstrapDraws.compute(input.asInstanceOf[UTF8String], mid, repBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, rid => {
      val midRef = ctx.addReferenceObj("bsMid", mid, "byte[]")
      val repRef = ctx.addReferenceObj("bsReps", repBytes, "byte[][]")
      s"${ev.value} = graft.plans.BootstrapDraws.compute($rid, $midRef, $repRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BootstrapDraws {
  /** Cumulative Poisson(1) CDF cut points — THE single source of
    * truth shared with the generated DuckDB oracle (Double.toString
    * round-trips exactly), truncated at w=5 (P(X>5|λ=1) ≈ 0.06%). */
  val poissonCdf: Array[Double] = {
    val e1 = math.exp(-1.0)
    Array(e1, e1 * 2.0, e1 * 2.5, e1 * 2.5 + e1 / 6.0,
      e1 * 2.5 + e1 / 6.0 + e1 / 24.0)
  }

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** The per-row loop (also the generated-code target): B digests of
    * ridBytes ++ ":salt:" ++ repDigits, each inverted to a weight.
    * u = unsigned first-4-digest-bytes / 2^32 — numerically identical
    * to `conv(substring(hex, 1, 8), 16, 10) / 4294967296.0`. */
  def compute(rid: UTF8String, mid: Array[Byte],
      reps: Array[Array[Byte]]): ArrayData = {
    val d = md.get()
    val ridBytes = rid.getBytes
    val c = poissonCdf
    val out = new Array[Long](reps.length)
    val buf = new Array[Byte](32)
    var r = 0
    while (r < reps.length) {
      d.reset()
      d.update(ridBytes)
      d.update(mid)
      d.update(reps(r))
      d.digest(buf, 0, 32)
      val v = ((buf(0) & 0xFFL) << 24) | ((buf(1) & 0xFFL) << 16) |
        ((buf(2) & 0xFFL) << 8) | (buf(3) & 0xFFL)
      val u = v.toDouble / 4294967296.0
      out(r) =
        if (u < c(0)) 0L else if (u < c(1)) 1L else if (u < c(2)) 2L
        else if (u < c(3)) 3L else if (u < c(4)) 4L else 5L
      r += 1
    }
    new GenericArrayData(out)
  }
}
