package graft

import org.apache.spark.sql.functions._
import graft.plans.MinHashSig

/** The native MinHashSig expression vs an independent Scala reference
  * implementation, across the codegen and interpreted paths and the
  * SQL-registered form.
  */
class MinHashSigSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(hashes: Seq[Long], numH: Int): Seq[Long] =
    (0 until numH).map { i =>
      val (a, b) = (MinHashSig.aParam(i), MinHashSig.bParam(i))
      if (hashes.isEmpty) Long.MaxValue
      else hashes.map(h => (a * (h & 0xFFFFFFFFL) + b) % MinHashSig.Prime).min
    }

  private val samples: Seq[Seq[Long]] = Seq(
    Seq(0L), Seq(-1L), Seq(Long.MinValue, Long.MaxValue),
    Seq.tabulate(50)(i => i * 0x9E3779B97F4A7C15L),
    Seq(42L, 42L, 7L))

  test("matches the reference implementation (codegen path)") {
    val df = samples.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "hs")
    val out = df.select(col("id"), operators.Dedup.minhashSig(col("hs"), 16).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(out(i) == reference(s, 16), s"sample $i")
    }
  }

  test("matches the reference implementation (interpreted eval path)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    samples.foreach { s =>
      val res = MinHashSig(Literal.create(s.toArray,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), 16)
        .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
      assert(res == reference(s, 16))
    }
  }

  test("SQL registration via GraftExtensions: graft_minhash()") {
    val row = spark.sql(
      "SELECT graft_minhash(array(1L, 2L, 3L), 8) AS sig").head
    assert(row.getSeq[Long](0) == reference(Seq(1L, 2L, 3L), 8))
  }

  test("SimHashVotes matches the per-bit HOF formulation") {
    def refVotes(hs: Seq[Long]): Seq[Int] =
      (0 until 64).map(i => hs.map(h => if (((h >> i) & 1L) == 1L) 1 else -1).sum)
    val hoF = samples.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "hs")
      .select(col("id"), graft.operators.Dedup.simhashVotes(col("hs")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1)).toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(hoF(i) == refVotes(s), s"sample $i")
    }
    // SQL registration
    val row = spark.sql("SELECT graft_simhash_votes(array(5L, -1L)) AS v").head
    assert(row.getSeq[Int](0) == refVotes(Seq(5L, -1L)))
  }

  test("null input row yields null signature") {
    val df = Seq((1, Some(Seq(1L, 2L))), (2, None))
      .toDF("id", "hs")
    val out = df.select(col("id"), operators.Dedup.minhashSig(col("hs"), 4).as("sig"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(1).isDefined && out(2).isEmpty)
  }
}
