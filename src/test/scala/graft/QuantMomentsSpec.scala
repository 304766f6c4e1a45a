package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 fused moments pass (QuantMomentTerms + LongVecSum)
  * bit-for-bit against the expression-tree form it replaced in
  * [[operators.Similarity.pcaTopComponent]]: same quantized-long
  * terms, same sums, same NULL contract (a position no row
  * contributed to is NULL, exactly like sum() over an all-NULL
  * group). */
class QuantMomentsSpec extends AnyFunSuite with SparkTestBase {

  private def termsCol(v: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.QuantMomentTerms(
        org.apache.spark.sql.GraftBridge.expression(v), 1e9))

  private def vecSum(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.LongVecSum(
        org.apache.spark.sql.GraftBridge.expression(c)).toAggregateExpression())

  /** The pre-r17 tree: floor(x·q+0.5) linear terms and upper-triangle
    * floor(xᵢxⱼ·q+0.5) products via posexplode / nested transform +
    * groupBy sums, assembled in (i asc, j asc) order. */
  private def treeMoments(emb: org.apache.spark.sql.DataFrame, dim: Int)
      : (Seq[Any], Seq[Any]) = {
    val v = col("v")
    val q = lit(1e9)
    val s = emb.select(posexplode(v).as(Seq("i", "x")))
      .groupBy(col("i")).agg(sum(floor(col("x") * q + 0.5)).as("sq"))
      .orderBy(col("i")).collect()
      .map(r => if (r.isNullAt(1)) null else r.getLong(1)).toSeq
    val p = emb.select(explode(flatten(transform(v, (xi, i) =>
        transform(slice(v, i + 1, lit(dim) - i), (xj, jj) =>
          struct(i.as("i"), (i + jj).as("j"),
            floor(xi * xj * q + 0.5).as("t")))))).as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.t")).as("pq"))
      .orderBy(col("i"), col("j")).collect()
      .map(r => if (r.isNullAt(2)) null else r.getLong(2)).toSeq
    (s, p)
  }

  private def fusedMoments(emb: org.apache.spark.sql.DataFrame, dim: Int)
      : (Seq[Any], Seq[Any]) = {
    val r = emb.select(termsCol(col("v")).as("t"))
      .agg(vecSum(col("t")).as("m"))
      .select(slice(col("m"), 1, dim).as("s"),
        slice(col("m"), dim + 1, dim * (dim + 1) / 2).as("p"))
      .collect().head
    (r.getSeq[Any](0), r.getSeq[Any](1))
  }

  test("fused moments == explode/groupBy tree on dense vectors") {
    val dim = 8
    val rows = (1 to 200).map { i =>
      (1 to dim).map(j => math.sin(i * 31 + j * 7) * (j + 0.5)).toArray
    }
    val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("v")
    val (ts, tp) = treeMoments(df, dim)
    val (fs, fp) = fusedMoments(df, dim)
    assert(fs == ts, "linear terms diverge")
    assert(fp == tp, "product terms diverge")
  }

  test("NULL parity: null elements null exactly their terms; all-null position -> NULL sum") {
    val dim = 4
    // row 1 has a null at pos 2; position 3 is null in EVERY row
    val rows: Seq[Seq[java.lang.Double]] = Seq(
      Seq[java.lang.Double](1.5, 2.5, null, null),
      Seq[java.lang.Double](0.5, -1.25, 3.0, null),
      Seq[java.lang.Double](2.0, 4.0, -0.5, null))
    val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("v")
      .select(col("v").cast("array<double>").as("v"))
    val (ts, tp) = treeMoments(df, dim)
    val (fs, fp) = fusedMoments(df, dim)
    assert(fs == ts, s"linear: $fs vs $ts")
    assert(fp == tp, s"products: $fp vs $tp")
    assert(fs.last == null, "all-null position must sum to NULL")
  }

  test("NULL rows are ignored; empty input -> NULL result") {
    val df = spark.createDataFrame(
      Seq(Tuple1(Array(1.0, 2.0)), Tuple1(null.asInstanceOf[Array[Double]])))
      .toDF("v")
    val r = df.select(termsCol(col("v")).as("t")).agg(vecSum(col("t")).as("m"))
      .collect().head
    assert(r.getSeq[Any](0) == Seq(1000000000L, 2000000000L,
      1000000000L, 2000000000L, 4000000000L))
    val empty = df.filter(lit(false))
      .select(termsCol(col("v")).as("t")).agg(vecSum(col("t")).as("m"))
      .collect().head
    assert(empty.isNullAt(0))
  }

  test("interpreted eval matches codegen for QuantMomentTerms") {
    val expr = graft.plans.QuantMomentTerms(
      org.apache.spark.sql.GraftBridge.expression(col("v")), 1e9)
    val df = spark.createDataFrame(Seq(Tuple1(Array(0.25, -1.75, 3.125))))
      .toDF("v")
    val viaPlan = df.select(
      org.apache.spark.sql.GraftBridge.column(expr).as("t")).collect()
      .head.getSeq[Long](0)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(0.25, -1.75, 3.125)))
    val interp = graft.plans.QuantMomentTerms(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true), 1e9)
      .eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == viaPlan.toSeq, s"interpreted $interp vs codegen $viaPlan")
  }
}
