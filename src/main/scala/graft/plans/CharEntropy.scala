package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: character-level Shannon entropy of a
  * string — ln(L) − Σ_c n_c·ln(n_c) / L, floored at 0.
  *
  * Replaces the higher-order-function formulation
  * (`aggregate(array_sort(split(text, '')), …)` — an interpreted
  * fold that materializes, then SORTS, a one-string-per-character
  * array per row, O(L log L) time and O(L) garbage). This expression
  * takes the raw string, counts characters in one O(L) pass with a
  * flat int[128] for ASCII (TreeMap spill for anything higher), and
  * stays inside whole-stage codegen as a single static call.
  *
  * Bit-parity with the HOF form (pinned in a spec): the per-character
  * n·ln(n) terms are accumulated in ASCENDING character order —
  * exactly the order the sorted-array fold visits runs — with the
  * same left-associative double additions and the same
  * `java.lang.Math.log`, so results are identical to the last ulp
  * and the DuckDB oracle (`list_sort(list_distinct(...))`, same
  * ascending order) keeps matching at round-6.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  /** One counting pass + ascending-order n·ln(n) accumulation.
    * Characters are Unicode CODE POINTS, matching both the HOF form
    * (Java-8+ regex `split(text, '')` splits between code points,
    * keeping surrogate pairs together) and the DuckDB oracle
    * (`string_split`/`length` count code points) — a charAt loop
    * would split astral characters (emoji etc.) into two surrogate
    * halves and silently diverge from both. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val len16 = str.length
    if (len16 == 0) return 0.0
    val ascii = new Array[Int](128)
    var high: java.util.TreeMap[Integer, Integer] = null
    var i = 0
    var len = 0 // code-point count
    while (i < len16) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (high == null) high = new java.util.TreeMap[Integer, Integer]()
        val prev = high.get(cp)
        high.put(cp, if (prev == null) 1 else prev + 1)
      }
      len += 1
      i += Character.charCount(cp)
    }
    var acc = 0.0
    var c = 0
    while (c < 128) {
      val n = ascii(c)
      if (n > 0) acc += n * java.lang.Math.log(n)
      c += 1
    }
    if (high != null) {
      val it = high.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val n = e.getValue.intValue()
        acc += n * java.lang.Math.log(n)
      }
    }
    java.lang.Math.max(0.0, java.lang.Math.log(len) - acc / len)
  }
}
