package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Engine extension point (SparkSessionExtensions): registers the
  * native expressions under SQL names so `spark.sql("… graft_minhash
  * (hashes, 32) …")` works next to the Column API. Installed by every
  * session builder via `.withExtensions(new GraftExtensions)` — the
  * Column-side path (`Dedup.minhashSig`) does NOT depend on the
  * extension being present.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_minhash(hashes, numHashes)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"numHashes must be an integer literal, got $other")
        }
        MinHashSig(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(a, b)")
        VectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[VectorSqDist].getName, "graft_sqdist"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_sqdist(a, b)")
        VectorSqDist(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_votes"),
      new ExpressionInfo(classOf[SimHashVotes].getName, "graft_simhash_votes"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_simhash_votes(hashedTokens)")
        SimHashVotes(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_srp_bands"),
      new ExpressionInfo(classOf[SrpBands].getName, "graft_srp_bands"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "graft_srp_bands(v, bands, bitsPerBand, dim)")
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"$name must be an integer literal, got $other")
        }
        SrpBands(children.head, intLit(children(1), "bands"),
          intLit(children(2), "bitsPerBand"), intLit(children(3), "dim"))
      }))
  }
}
