package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The native SrpBands expression vs the composed HOF form
  * (`packBands(hyperplaneBits(...))`) it replaced in the ANN query
  * path — bit-identical band keys across configurations, on both the
  * codegen and interpreted paths, so LSH bucketing (and therefore
  * every recall number) is unchanged by the swap.
  */
class SrpBandsSpec extends SparkTestBase {

  private lazy val emb = Similarity.embTable(spark, sf).limit(100).cache()

  private val configs = Seq((1, 8), (2, 8), (8, 8), (4, 4), (8, 12))

  test("bit-identical to the composed packBands(hyperplaneBits(...)) form") {
    configs.foreach { case (bands, bits) =>
      val both = emb.select(col("vec_id"),
          Similarity.srpBands(col("v"), bands, bits).as("native"),
          Similarity.packBands(
            Similarity.hyperplaneBits(col("v"), bands * bits),
            bands, bits).as("composed"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"$bands×$bits mismatch for vec ${r.getLong(0)}")
      }
    }
  }

  test("interpreted eval matches the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vecs = emb.limit(10).collect().map(_.getSeq[Double](1).toArray)
    val fromDf = emb.limit(10)
      .select(Similarity.srpBands(col("v"), 8, 8).as("b"))
      .collect().map(_.getSeq[Long](0))
    vecs.zip(fromDf).foreach { case (v, expected) =>
      val interpreted = graft.plans.SrpBands(
          Literal.create(v, ArrayType(DoubleType)), 8, 8, 64)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      assert(interpreted == expected)
    }
  }

  test("SQL registration via GraftExtensions: graft_srp_bands()") {
    val viaSql = spark.sql(
      """SELECT graft_srp_bands(array(CAST(1.0 AS DOUBLE), -2.0, 0.5), 2, 8, 64) AS b""")
      .head.getSeq[Long](0)
    val viaColumn = spark.range(1)
      .select(Similarity.srpBands(
        array(lit(1.0), lit(-2.0), lit(0.5)), 2, 8).as("b"))
      .head.getSeq[Long](0)
    assert(viaSql == viaColumn && viaSql.length == 2)
  }

  test("keys stay within the bitsPerBand range") {
    val keys = emb.select(explode(Similarity.srpBands(col("v"), 8, 8)).as("k"))
      .agg(min(col("k")), max(col("k"))).head()
    assert(keys.getLong(0) >= 0L && keys.getLong(1) < (1L << 8))
  }

  test("a NULL vector yields a NULL signature; non-positive dims fail loudly") {
    import spark.implicits._
    val rows = Seq((1L, Some(Seq(1.0, -1.0))), (2L, None))
      .toDF("vec_id", "v")
      .select(col("vec_id"), Similarity.srpBands(col("v"), 2, 8).as("b"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isDefined && rows(2L).isEmpty)
    intercept[IllegalArgumentException] {
      graft.plans.SrpBands(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(1.0), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)), 2, 8, 0)
    }
  }
}
