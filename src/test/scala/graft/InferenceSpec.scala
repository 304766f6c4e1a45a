package graft

import org.apache.spark.sql.functions._
import graft.operators.Inference

/** Closed-form fixtures for the round-13 inference battery — every
  * expected value hand-derivable (the OperatorSemanticsSpec posture);
  * engine-vs-DuckDB parity is covered by the registered oracles. */
class InferenceSpec extends SparkTestBase {

  private def ev(t: String, day: Int, user: Long, v: Double) =
    (java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"),
      t, user, v)

  test("anovaOneWay: textbook two-group decomposition, F exact") {
    import spark.implicits._
    // groups {1,2,3} vs {4,5,6}: SSB = 13.5, SSW = 4, F = 13.5
    val rows = Seq(1.0, 2.0, 3.0).map(v => ev("view", 0, 1L, v)) ++
      Seq(4.0, 5.0, 6.0).map(v => ev("purchase", 0, 2L, v))
    val r = Inference.anovaOneWay(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 13.5 && r.getDouble(3) == 4.0, r.toString)
    assert(r.getDouble(4) == 13.5, r.toString)
  }

  test("anovaOneWay: zero within-variance yields NULL F, not a division blowup") {
    import spark.implicits._
    val rows = Seq(ev("view", 0, 1L, 2.0), ev("view", 0, 1L, 2.0),
      ev("purchase", 0, 2L, 5.0), ev("purchase", 0, 2L, 5.0))
    val r = Inference.anovaOneWay(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getDouble(3) == 0.0 && r.isNullAt(4), r.toString)
  }

  test("leveneBrownForsythe: hand-traced deviations, even AND odd group sizes") {
    import spark.implicits._
    // view {1,2,3,10}: n even -> lower median at rank 2 = 2; d = 1,0,1,8
    // purchase {5,5,5}: median 5; d = 0,0,0
    // moments (cents grid /1e4 cancels): SSB/SSW from d-cents exactly:
    // group A: n=4, s=1000, q=6600*100... derive via the oracle chain:
    // dA(cents)={100,0,100,800}, sA=1000, qA=660000; dB={0,0,0}
    // a = 1000^2/4 = 250000; st=1000, n=7 -> ssb=(250000-1000000/7)/1e4
    // = 10.7143 (4dp); ssw=(660000-250000)/1e4 = 41.0
    // F = (10.714286/1)/(41/5) = 1.306620 (6dp)
    val rows = Seq(1.0, 2.0, 3.0, 10.0).map(v => ev("view", 0, 1L, v)) ++
      Seq(5.0, 5.0, 5.0).map(v => ev("purchase", 0, 2L, v))
    val r = Inference.leveneBrownForsythe(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 7)
    assert(r.getDouble(2) == 10.7143 && r.getDouble(3) == 41.0, r.toString)
    assert(r.getDouble(4) == 1.306620 || r.getDouble(4) == 1.30662, r.toString)
  }

  test("kruskalWallis: tie-free two-group H matches the closed form") {
    import spark.implicits._
    // ranks 1..6, R1 = 6, R2 = 15: H = 12/42 * (36/3 + 225/3) - 21
    val rows = Seq(1.0, 2.0, 3.0).map(v => ev("view", 0, 1L, v)) ++
      Seq(4.0, 5.0, 6.0).map(v => ev("purchase", 0, 2L, v))
    val r = Inference.kruskalWallis(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 3.857143, r.toString)
    assert(r.getDouble(3) == 3.857143, r.toString) // no ties: C = 1
  }

  test("kruskalWallis: all-tied values yield NULL corrected H (C = 0)") {
    import spark.implicits._
    val rows = Seq(ev("view", 0, 1L, 7.0), ev("view", 0, 1L, 7.0),
      ev("purchase", 0, 2L, 7.0))
    val r = Inference.kruskalWallis(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.isNullAt(3), r.toString)
  }

  test("kaplanMeier: hand-traced product-limit curve with censoring") {
    import spark.implicits._
    // arm 0 (even users): u0/u6 convert day 2, u2 converts day 4,
    // u4 never converts (censored at the corpus horizon = day 4).
    // day 2: n=4, d=2 -> S=0.5; day 4: n=2, d=1 -> S=0.25.
    val rows = Seq(
      ev("view", 0, 0L, 1.0), ev("purchase", 2, 0L, 1.0),
      ev("view", 0, 2L, 1.0), ev("purchase", 4, 2L, 1.0),
      ev("view", 0, 4L, 1.0),
      ev("view", 0, 6L, 1.0), ev("purchase", 2, 6L, 1.0))
    val r = Inference.kaplanMeier(
      rows.toDF("ts", "event_type", "user_id", "value")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))
    assert(r.toSeq == Seq((0L, 2L, 4L, 2L, 0.5), (0L, 4L, 2L, 1L, 0.25)),
      r.mkString(", "))
  }

  test("kaplanMeier: purchase BEFORE the first view does not count as conversion") {
    import spark.implicits._
    // u0 purchases day 0, first view day 2 -> censored at horizon day 2
    val rows = Seq(ev("purchase", 0, 0L, 1.0), ev("view", 2, 0L, 1.0),
      ev("view", 0, 2L, 1.0), ev("purchase", 1, 2L, 1.0))
    val r = Inference.kaplanMeier(
      rows.toDF("ts", "event_type", "user_id", "value")).collect()
    // only u2's day-1 conversion is an event; u0 stays censored
    assert(r.length == 1 && r.head.getLong(0) == 0L &&
      r.head.getLong(1) == 1L && r.head.getLong(3) == 1L, r.mkString(", "))
  }

  test("jarqueBera: symmetric two-point group exact; n<4 guarded NULL") {
    import spark.implicits._
    // {0,0,10,10}: z = ±√3/2, S = 0, K = 9/16 − 3 = −2.4375,
    // JB = 4/6 · (−2.4375)²/4 = 0.9902 at 4 dp
    val df = Seq(("a", 0.0), ("a", 0.0), ("a", 10.0), ("a", 10.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Inference.jarqueBera(df, col("g"), col("v")).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getDouble(2) == 0.0 && a.getDouble(3) == -2.4375, a.toString)
    assert(a.getDouble(4) == 0.9902, a.toString)
    assert(r("b").isNullAt(4), r("b").toString) // n = 3 < 4
  }

  test("jensenShannon: identical mixes read 0, disjoint mixes read ln 2") {
    import spark.implicits._
    val same = Seq(ev("view", 0, 1L, 10.0), ev("purchase", 0, 2L, 10.0),
      ev("view", 0, 1L, 60.0), ev("purchase", 0, 2L, 60.0))
    val r0 = Inference.jensenShannon(
      same.toDF("ts", "event_type", "user_id", "value"), "view", "purchase")
      .collect().head
    assert(r0.getDouble(3) == 0.0, r0.toString)
    val disjoint = Seq(ev("view", 0, 1L, 10.0), ev("purchase", 0, 2L, 60.0))
    val r1 = Inference.jensenShannon(
      disjoint.toDF("ts", "event_type", "user_id", "value"), "view", "purchase")
      .collect().head
    assert(r1.getDouble(3) == 0.693147, r1.toString) // ln 2 at 6 dp
  }
}
