package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The native VectorDot expression vs the interpreted HOF fold it
  * replaced — bit-identical sums (same sequential order), null/length
  * semantics, codegen + interpreted + SQL-registered paths.
  */
class VectorDotSpec extends SparkTestBase {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  private val rnd = new scala.util.Random(3)
  private val samples: Seq[Seq[Double]] =
    Seq(Seq(0.0), Seq(1.5, -2.25, 3.125)) ++
      Seq.fill(5)(Seq.fill(64)(rnd.nextGaussian()))

  test("bit-identical to the HOF fold (codegen path)") {
    val df = samples.indices.map(i =>
      (i, samples(i), samples((i + 1) % samples.size).take(samples(i).size)))
      .toDF("id", "a", "b")
      .filter(size(col("a")) === size(col("b")))
    val rows = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
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
    samples.foreach { s =>
      val lit = Literal.create(s.toArray, ArrayType(DoubleType))
      val got = graft.plans.VectorDot(lit, lit).eval(null).asInstanceOf[Double]
      var want = 0.0
      s.foreach(x => want += x * x)
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
    val out = df.select(col("id"), Similarity.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(1).contains(11.0))
    assert(out(2).isEmpty && out(3).isEmpty && out(4).isEmpty)
  }

  test("SQL registration via GraftExtensions: graft_dot()") {
    val row = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head
    assert(row.getDouble(0) == 11.0)
  }
}
