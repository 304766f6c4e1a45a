package graft

import org.apache.spark.sql.functions._

/** The native VectorSqDist expression vs the interpreted HOF fold it
  * replaced in kmeansExact — bit-identical sums (same sequential
  * order), null/length semantics, codegen + interpreted +
  * SQL-registered paths.
  */
class VectorSqDistSpec extends SparkTestBase {
  import spark.implicits._

  private def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.VectorSqDist(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** The exact r11 kmeansExact formulation this expression replaced. */
  private def hofD2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, t) => acc + t)

  private val rnd = new scala.util.Random(7)
  private val samples: Seq[Seq[Double]] =
    Seq(Seq(0.0), Seq(1.5, -2.25, 3.125)) ++
      Seq.fill(5)(Seq.fill(64)(rnd.nextGaussian()))

  test("bit-identical to the HOF fold (codegen path)") {
    val df = samples.indices.map(i =>
      (i, samples(i), samples((i + 1) % samples.size).take(samples(i).size)))
      .toDF("id", "a", "b")
      .filter(size(col("a")) === size(col("b")))
    val rows = df.select(col("id"),
      native(col("a"), col("b")).as("native"),
      hofD2(col("a"), col("b")).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row ${r.getInt(0)}")
    }
  }

  test("interpreted eval path matches a plain Scala loop") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    samples.sliding(2).foreach { pair =>
      val a = pair.head
      val b = pair.last.take(a.size).padTo(a.size, 0.5)
      val la = Literal.create(a.toArray, ArrayType(DoubleType))
      val lb = Literal.create(b.toArray, ArrayType(DoubleType))
      val got = graft.plans.VectorSqDist(la, lb).eval(null).asInstanceOf[Double]
      var want = 0.0
      a.zip(b).foreach { case (x, c) => val d = x - c; want += d * d }
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want))
    }
  }

  test("null vector, null element, and length mismatch all yield NULL") {
    val df = Seq(
      (1, Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](3.0, 4.0))),
      (2, None, Some(Seq[java.lang.Double](1.0))),
      (3, Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](1.0, 1.0))),
      (4, Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](1.0))),
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), native(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(1).contains(8.0))
    assert(out(2).isEmpty && out(3).isEmpty && out(4).isEmpty)
  }

  test("SQL registration via GraftExtensions: graft_sqdist()") {
    val row = spark.sql(
      "SELECT graft_sqdist(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head
    assert(row.getDouble(0) == 8.0)
  }
}
