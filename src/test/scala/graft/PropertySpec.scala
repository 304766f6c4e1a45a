package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.{Climate, TextOps}

/** Property-based checks (SURVEY §5.2.3): algebraic equivalences that
  * must hold for ALL inputs, complementing the example-based specs.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  /** Deterministic property driver over the raw scalacheck API (the
    * scalatest-scalacheck bridge isn't in the offline dependency set):
    * evaluates the generator under `trials` fixed seeds. */
  private def forAllSeeded[A](gen: Gen[A], trials: Int = 15)(body: A => Unit): Unit =
    (1 to trials).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val tsGen: Gen[Timestamp] = for {
    y <- Gen.choose(1994, 2002)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23)
  } yield Timestamp.valueOf(f"$y%04d-$m%02d-$d%02d $h%02d:30:00")

  test("timestampRange ≡ the reference's (year,month) boolean tree, for all timestamps") {
    forAllSeeded(Gen.listOfN(40, tsGen)) { (tss: List[Timestamp]) =>
      if (tss.nonEmpty) {
        val df = tss.toDF("ts")
          .withColumn("year", year(col("ts"))).withColumn("month", month(col("ts")))
        val viaRange = df.filter(Climate.timestampRange(col("ts"), 1996, 2, 1999, 10))
          .select("ts").collect().map(_.getTimestamp(0)).toSet
        val viaTree = df.filter(Climate.timeRange(col("year"), col("month"), 1996, 2, 1999, 10))
          .select("ts").collect().map(_.getTimestamp(0)).toSet
        assert(viaRange == viaTree)
      }
    }
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
    .map(_.take(30).mkString(" "))

  test("exact dedup is idempotent and total: groups partition the corpus") {
    forAllSeeded(Gen.listOfN(20, wordGen), trials = 8) { (texts: List[String]) =>
      if (texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val groups = TextOps.dedupExact(docs).collect()
        // total: multiplicities sum to corpus size
        assert(groups.map(_.getLong(1)).sum == texts.length)
        // one group per distinct text
        assert(groups.length == texts.distinct.length)
        // keep_ids are distinct doc_ids
        val keeps = groups.map(_.getLong(0))
        assert(keeps.distinct.length == keeps.length)
      }
    }
  }

  test("land semi-join output ⊆ input and ∪ with anti = input") {
    forAllSeeded(Gen.zip(Gen.listOfN(30, Gen.choose(0, 5)),
      Gen.listOfN(5, Gen.choose(0, 5))), trials = 8) {
      case (pts: List[Int], land: List[Int]) =>
        if (pts.nonEmpty) {
          val p = pts.zipWithIndex.map { case (c, i) => (i.toLong, c, 0) }
            .toDF("id", "cell_lat", "cell_lon")
          val l = land.map((_, 0)).toDF("cell_lat", "cell_lon").distinct()
          val semi = Climate.landMask(p, l).select("id")
            .collect().map(_.getLong(0)).toSet
          val landSet = land.toSet
          val expected = pts.zipWithIndex
            .collect { case (c, i) if landSet(c) => i.toLong }.toSet
          assert(semi == expected)
        }
    }
  }
}
