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

  test("logRank: hand-traced two-day risk sets and quantized E/V sums") {
    import spark.implicits._
    // arm1 = odd users {1,3}, arm0 = even {2,4}; horizon = day 3.
    // u1: view d1, purchase d2 -> t=1, ev=1 (arm1)
    // u2: view d1, purchase d3 -> t=2, ev=1 (arm0)
    // u3/u4: view d1, censored at horizon -> t=2
    // day1: D=1, d1=1, N=4, n1=2 -> E=0.5, V=0.25
    // day2: D=1, d1=0, N=3, n1=1 -> E=1/3, V=2/9
    val rows = Seq(
      ev("view", 1, 1L, 1.0), ev("purchase", 2, 1L, 1.0),
      ev("view", 1, 2L, 1.0), ev("purchase", 3, 2L, 1.0),
      ev("view", 1, 3L, 1.0), ev("view", 1, 4L, 1.0))
    val r = Inference.logRank(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 1, r.toString)
    assert(r.getDouble(2) == 0.8333 && r.getDouble(3) == 0.4722, r.toString)
    // chi2 replays the engine's quantized chain exactly
    val e = 833333.0 / 1e6; val v = 472222.0 / 1e6
    val want = math.floor((1.0 - e) * (1.0 - e) / v * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) == want, s"$r vs $want")
  }

  test("logRank: everyone-dies-at-once variance degenerates to NULL; staggered exact") {
    import spark.implicits._
    // both arms convert on the SAME day: N-D = 0 kills every V term
    // -> chi2 must read NULL, never 0/0
    val sameDay = Seq(
      ev("view", 1, 1L, 1.0), ev("purchase", 2, 1L, 1.0),
      ev("view", 1, 2L, 1.0), ev("purchase", 2, 2L, 1.0))
    val r0 = Inference.logRank(
      sameDay.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r0.getLong(1) == 1 && r0.getDouble(2) == 1.0, r0.toString)
    assert(r0.isNullAt(4), r0.toString)
    // staggered: u1 (arm1) converts day 1, u2 (arm0) day 2 ->
    // day1: E=0.5, V=0.25; day2: arm1 empty, E=V=0 -> chi2 = .25/.25 = 1
    val staggered = Seq(
      ev("view", 1, 1L, 1.0), ev("purchase", 2, 1L, 1.0),
      ev("view", 1, 2L, 1.0), ev("purchase", 3, 2L, 1.0))
    val r1 = Inference.logRank(
      staggered.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r1.getLong(1) == 1 && r1.getDouble(2) == 0.5 &&
      r1.getDouble(3) == 0.25, r1.toString)
    assert(r1.getDouble(4) == 1.0, r1.toString)
  }

  test("mcnemar: only discordant pairs drive the corrected statistic") {
    import spark.implicits._
    // 10-day calendar (d1..d11): first half = days <= 6.
    // u1 purchases d2 only (b), u2 purchases d10 only (c),
    // u3 purchases both halves, u4 only views (calendar pins).
    val rows = Seq(
      ev("view", 0, 4L, 1.0), ev("view", 10, 4L, 1.0),
      ev("purchase", 1, 1L, 1.0),
      ev("purchase", 9, 2L, 1.0),
      ev("purchase", 1, 3L, 1.0), ev("purchase", 9, 3L, 1.0))
    val r = Inference.mcnemarPaired(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 1, r.toString)  // n, both
    assert(r.getLong(2) == 1 && r.getLong(3) == 1, r.toString)  // b, c
    // (|1-1|-1)^2 / 2 = 0.5
    assert(r.getDouble(4) == 0.5, r.toString)
  }

  test("mcnemar: zero discordant pairs read NULL, not a division blowup") {
    import spark.implicits._
    val rows = Seq(ev("view", 0, 1L, 1.0), ev("view", 10, 1L, 1.0))
    val r = Inference.mcnemarPaired(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.isNullAt(4), r.toString)
  }

  test("cmhStratified: two hand-built strata, chi2 and pooled OR exact") {
    import spark.implicits._
    // stratum A: a=3,b=0,c=0,d=3 (T=6): E=1.5, V=0.45, r=1.5, s=0
    // stratum B: a=1,b=1,c=1,d=1 (T=4): E=1,   V=1/3,  r=1/4, s=1/4
    // sum_a=4, E=2.5, V=0.78333..; chi2=(1.5-0.5)^2/V; OR=1.75/0.25=7
    def o(k: Long, cust: Long, pri: String, st: String) =
      (k, cust, st, 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), pri)
    val orders = (
      (1L to 3L).map(i => o(i, 1L, "1-URGENT", "F")) ++
      (4L to 6L).map(i => o(i, 1L, "5-LOW", "O")) ++
      Seq(o(7L, 2L, "2-HIGH", "F"), o(8L, 2L, "2-HIGH", "O"),
        o(9L, 2L, "5-LOW", "F"), o(10L, 2L, "5-LOW", "O"))
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    val customer = Seq((1L, "a", 1, 0.0, "BUILDING"),
      (2L, "b", 1, 0.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val r = Inference.cmhStratified(orders, customer).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4, r.toString)
    assert(r.getDouble(2) == 2.5, r.toString)
    val sv = 0.45 + 2.0 * 2.0 * 2.0 * 2.0 / (4.0 * 4.0 * 3.0)
    val want = math.floor(1.0 / sv * 1e6 + 0.5) / 1e6
    assert(r.getDouble(3) == want, s"$r vs $want")
    assert(r.getDouble(4) == 7.0, r.toString)
  }

  test("fdrBh: tied battery adjusts to the raw p; step-up never exceeds 1") {
    import spark.implicits._
    // cohort 0: 10 views, 0 purchases; cohort 1: 5 views + 5 purchases
    // -> |z| identical, pvals tie, BH leaves both at p (m/rank chain:
    // min(2p, p) = p); neither rejects at q=.05
    val rows =
      (1 to 10).map(i => ev("view", i % 9, 20L, 1.0)) ++
      (1 to 5).map(i => ev("view", i, 21L, 1.0)) ++
      (1 to 5).map(i => ev("purchase", i, 21L, 1.0))
    val r = Inference.fdrBh(
      rows.toDF("ts", "event_type", "user_id", "value")).collect()
    assert(r.length == 2, r.mkString(", "))
    val byC = r.map(x => x.getLong(0) -> x).toMap
    assert(byC(0L).getLong(1) == 0 && byC(0L).getLong(2) == 10)
    assert(byC(1L).getLong(1) == 5 && byC(1L).getLong(2) == 10)
    assert(byC(0L).getDouble(3) == 0.0 && byC(1L).getDouble(3) == 0.5)
    // symmetric battery: equal-magnitude opposite z, tied p
    assert(byC(0L).getDouble(4) == -byC(1L).getDouble(4),
      r.mkString(", "))
    assert(byC(0L).getDouble(5) == byC(1L).getDouble(5))
    assert(byC(0L).getDouble(6) == byC(0L).getDouble(5),
      "BH on a tied 2-battery must leave p_bh = p")
    assert(byC(0L).getInt(7) == 0 && byC(1L).getInt(7) == 0)
    // p from the A&S 7.1.26 replay: z = 0.25/sqrt(.25*.75/10)
    val z = 0.25 / math.sqrt(0.25 * 0.75 / 10.0)
    val x = z / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val p = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    assert(byC(1L).getDouble(5) == math.floor(p * 1e6 + 0.5) / 1e6,
      s"${byC(1L)} vs $p")
  }

  test("wilsonCi: closed-form replay; zero-converter arm stays inside [0,1]") {
    import spark.implicits._
    // arm1 (u1): view+purchase (x=1, n=1); arm0 (u2,u4): views only (x=0, n=2)
    val rows = Seq(
      ev("view", 1, 1L, 1.0), ev("purchase", 2, 1L, 1.0),
      ev("view", 1, 2L, 1.0), ev("view", 1, 4L, 1.0))
    val r = Inference.wilsonCi(
      rows.toDF("ts", "event_type", "user_id", "value")).collect()
    val byArm = r.map(x => x.getLong(0) -> x).toMap
    val a0 = byArm(0L)
    assert(a0.getLong(1) == 0 && a0.getLong(2) == 2 &&
      a0.getDouble(3) == 0.0, a0.toString)
    // Wald would read [0,0] here; Wilson must open a real interval
    assert(a0.getDouble(4) == 0.0 && a0.getDouble(5) > 0.0 &&
      a0.getDouble(5) < 1.0, a0.toString)
    def wilson(x: Long, n: Long): (Double, Double) = {
      val nD = n.toDouble; val ph = x.toDouble / nD
      val z2 = 1.96 * 1.96
      val den = 1.0 + z2 / nD
      val c = (ph + z2 / (2.0 * nD)) / den
      val h = 1.96 * math.sqrt(ph * (1.0 - ph) / nD +
        z2 / (4.0 * nD * nD)) / den
      (math.floor((c - h) * 1e6 + 0.5) / 1e6,
        math.floor((c + h) * 1e6 + 0.5) / 1e6)
    }
    val (lo1, hi1) = wilson(1L, 1L)
    val a1 = byArm(1L)
    assert(a1.getDouble(4) == lo1 && a1.getDouble(5) == hi1, a1.toString)
  }

  test("fisherExact: textbook 3v3 table, two-sided tail exact") {
    import spark.implicits._
    // arm1 {1,3,5} all convert, arm0 {2,4,6} none: a=3, n1=3, m1=3,
    // T=6. Hypergeom pmf over C(6,3)=20: k=0 -> .05, 1 -> .45,
    // 2 -> .45, 3 -> .05; two-sided p = P(0)+P(3) = 0.1
    val rows = Seq(1L, 3L, 5L).flatMap(u =>
      Seq(ev("view", 1, u, 1.0), ev("purchase", 2, u, 1.0))) ++
      Seq(2L, 4L, 6L).map(u => ev("view", 1, u, 1.0))
    val r = Inference.fisherExact(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3 &&
      r.getLong(2) == 3 && r.getLong(3) == 6, r.toString)
    assert(r.getDouble(4) == 0.1, r.toString)
  }

  test("fisherExact: degenerate margin (no conversions) reads p = 1") {
    import spark.implicits._
    val rows = Seq(1L, 2L).map(u => ev("view", 1, u, 1.0))
    val r = Inference.fisherExact(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(2) == 0 && r.getDouble(4) == 1.0, r.toString)
  }

  test("tostEquivalence: identical tight arms read equivalent; zero variance reads NULL") {
    import spark.implicits._
    val rows = Seq(
      ev("view", 0, 1L, 10.0), ev("view", 0, 1L, 10.01),
      ev("purchase", 0, 2L, 10.0), ev("purchase", 0, 2L, 10.01))
    val r = Inference.tostEquivalence(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, r.toString)
    assert(r.getDouble(2) == 0.0, r.toString)          // mean_diff
    assert(r.getDouble(3) == 0.50025, r.toString)      // delta = 5% of 10.005
    assert(r.getDouble(4) == -r.getDouble(5), r.toString)
    assert(r.getDouble(4) >= 1.644854 && r.getInt(6) == 1, r.toString)
    // zero-variance pair: se = 0 must read NULL t's, equivalent = 0
    val flat = Seq(ev("view", 0, 1L, 5.0), ev("view", 0, 1L, 5.0),
      ev("purchase", 0, 2L, 5.0), ev("purchase", 0, 2L, 5.0))
    val r0 = Inference.tostEquivalence(
      flat.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r0.isNullAt(4) && r0.isNullAt(5) && r0.getInt(6) == 0,
      r0.toString)
  }

  test("powerMde: closed-form replay; degenerate pooled rate reads NULL") {
    import spark.implicits._
    // arm0 {2,4}: u2 converts; arm1 {1,3}: u1 converts -> pooled 0.5
    val rows = Seq(
      ev("view", 1, 1L, 1.0), ev("purchase", 2, 1L, 1.0),
      ev("view", 1, 2L, 1.0), ev("purchase", 2, 2L, 1.0),
      ev("view", 1, 3L, 1.0), ev("view", 1, 4L, 1.0))
    val r = Inference.powerMde(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 &&
      r.getDouble(2) == 0.5, r.toString)
    val zsum = 1.959964 + 0.841621
    val mde = zsum * math.sqrt(0.5 * 0.5 * (0.5 + 0.5))
    assert(r.getDouble(3) == math.floor(mde * 1e6 + 0.5) / 1e6, r.toString)
    val nreq = zsum * zsum * 2.0 * 0.25 / (0.05 * 0.05)
    assert(r.getLong(4) == math.ceil(nreq).toLong, r.toString)
    // every user converts: xt = nt -> NULL mde, NULL n
    val all = Seq(
      ev("view", 1, 1L, 1.0), ev("purchase", 2, 1L, 1.0),
      ev("view", 1, 2L, 1.0), ev("purchase", 2, 2L, 1.0))
    val r1 = Inference.powerMde(
      all.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r1.isNullAt(3) && r1.isNullAt(4), r1.toString)
  }

  test("pairedTTest: hand-traced two-user differences; zero variance reads NULL") {
    import spark.implicits._
    // 10-day calendar (pins at d1/d11): first half = days <= 6.
    // u1: first {10, 20} -> 15, second {12} -> d = 3
    // u2: first {5},      second {9}        -> d = -4
    // u3: second-half only -> excluded from the pairs
    // mean_d = -0.5; var = 24.5; t = -0.5 / sqrt(24.5/2) = -0.142857
    val rows = Seq(
      ev("view", 0, 1L, 10.0), ev("view", 1, 1L, 20.0),
      ev("view", 9, 1L, 12.0),
      ev("view", 1, 2L, 5.0), ev("view", 9, 2L, 9.0),
      ev("view", 10, 3L, 7.0))
    val r = Inference.pairedTTest(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 2 && r.getDouble(1) == -0.5, r.toString)
    val want = math.floor(-0.5 / math.sqrt(24.5 / 2.0) * 1e6 + 0.5) / 1e6
    assert(r.getDouble(2) == want, s"$r vs $want")
    // identical differences across users: s_d = 0 -> NULL t
    val flat = Seq(
      ev("view", 0, 1L, 10.0), ev("view", 9, 1L, 8.0),
      ev("view", 1, 2L, 6.0), ev("view", 9, 2L, 4.0),
      ev("view", 10, 2L, 4.0))
    val r0 = Inference.pairedTTest(
      flat.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r0.getLong(0) == 2 && r0.getDouble(1) == 2.0 && r0.isNullAt(2),
      r0.toString)
  }

  // ------------------------------------------------- degenerate tier
  // The battery's central parity claim is that the engine and its
  // DuckDB twin guard the SAME degenerate inputs with the SAME NULLs.
  // The registered sf fixtures never exercise those branches
  // end-to-end, so this tier pins them: single arm (k < 2), one row
  // per arm (n <= k), all-constant values (zero variance / all ties),
  // and EMPTY input — each must read NULL (never NaN, never a crash),
  // exactly the branch the oracle's CASE guard takes.

  test("degenerate tier: single arm reads NULL across anova/levene/kruskal") {
    import spark.implicits._
    val one = Seq(ev("view", 0, 1L, 1.0), ev("view", 1, 2L, 2.0),
      ev("view", 2, 3L, 3.0)).toDF("ts", "event_type", "user_id", "value")
    val a = Inference.anovaOneWay(one).collect().head
    assert(a.getLong(0) == 1 && a.isNullAt(4), a.toString)
    val l = Inference.leveneBrownForsythe(one).collect().head
    assert(l.getLong(0) == 1 && l.isNullAt(4), l.toString)
    // kruskal: a single arm holds ALL the ranks, so H is identically 0
    // in the closed form — both twins compute the same degenerate 0.0
    // (no guard needed; parity is at the value, not at NULL)
    val k = Inference.kruskalWallis(one).collect().head
    assert(k.getLong(0) == 1 && k.getDouble(2) == 0.0 &&
      k.getDouble(3) == 0.0, k.toString)
  }

  test("degenerate tier: one row per arm (n = k) reads NULL F") {
    import spark.implicits._
    val tiny = Seq(ev("view", 0, 1L, 1.0), ev("purchase", 0, 2L, 2.0))
      .toDF("ts", "event_type", "user_id", "value")
    val a = Inference.anovaOneWay(tiny).collect().head
    assert(a.getLong(0) == 2 && a.getLong(1) == 2 && a.isNullAt(4), a.toString)
    val l = Inference.leveneBrownForsythe(tiny).collect().head
    assert(l.isNullAt(4), l.toString)
  }

  test("degenerate tier: all-constant values read NULL across the battery") {
    import spark.implicits._
    val const = Seq(ev("view", 0, 1L, 5.0), ev("view", 1, 2L, 5.0),
      ev("purchase", 0, 3L, 5.0), ev("purchase", 1, 4L, 5.0))
      .toDF("ts", "event_type", "user_id", "value")
    assert(Inference.anovaOneWay(const).collect().head.isNullAt(4))
    assert(Inference.leveneBrownForsythe(const).collect().head.isNullAt(4))
    assert(Inference.kruskalWallis(const).collect().head.isNullAt(3))
    val t = Inference.tostEquivalence(const).collect().head
    // zero pooled variance: both one-sided t's and the flag read NULL
    assert(t.isNullAt(t.fieldIndex("t_lower")) &&
      t.isNullAt(t.fieldIndex("t_upper")), t.toString)
  }

  test("degenerate tier: EMPTY input yields a guarded row, never a blowup") {
    import spark.implicits._
    val empty = Seq.empty[(java.sql.Timestamp, String, Long, Double)]
      .toDF("ts", "event_type", "user_id", "value")
    // the global aggregate's one row reads k=0 with NULL sums — the
    // exact row DuckDB's CAST(sum(...) AS BIGINT) yields on zero input
    val a = Inference.anovaOneWay(empty).collect().head
    assert(a.getLong(0) == 0 && a.isNullAt(1) && a.isNullAt(4), a.toString)
    val k = Inference.kruskalWallis(empty).collect().head
    assert(k.getLong(0) == 0 && k.isNullAt(1) && k.isNullAt(3), k.toString)
    val l = Inference.leveneBrownForsythe(empty).collect().head
    assert(l.isNullAt(4), l.toString)
  }

  test("degenerate tier: fdrBh all-purchase pool (rate 1) reads NULL, never NaN") {
    import spark.implicits._
    // every event converts: pooled rate = 1 -> zero z denominator;
    // the battery must read NULL pval/p_bh/reject on every cohort
    val rows = (1 to 8).map(i => ev("purchase", i % 5, i.toLong, 1.0))
    val r = Inference.fdrBh(
      rows.toDF("ts", "event_type", "user_id", "value")).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.isNullAt(x.fieldIndex("z")) &&
        x.isNullAt(x.fieldIndex("pval")) &&
        x.isNullAt(x.fieldIndex("p_bh")) &&
        x.isNullAt(x.fieldIndex("reject")), x.toString)
    }
  }

  test("degenerate tier: pairedTTest with no both-halves users reads a guarded row") {
    import spark.implicits._
    // u1 first half only, u2 second half only: zero pairs
    val rows = Seq(ev("view", 0, 1L, 1.0), ev("view", 9, 2L, 2.0))
    val r = Inference.pairedTTest(
      rows.toDF("ts", "event_type", "user_id", "value")).collect().head
    assert(r.getLong(0) == 0 && r.isNullAt(2), r.toString)
  }

  test("degenerate tier: cochranArmitage single priority level reads NULL z") {
    import spark.implicits._
    def o(k: Long, pri: String, st: String) =
      (k, 1L, st, 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), pri)
    val orders = Seq(o(1, "1-URGENT", "F"), o(2, "1-URGENT", "O"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = Inference.cochranArmitage(orders).collect().head
    assert(r.isNullAt(4), r.toString)
  }

  test("cochranArmitage: textbook two-level trend exact; all-success pool reads NULL") {
    import spark.implicits._
    def o(k: Long, pri: String, st: String) =
      (k, 1L, st, 1.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), pri)
    // w=1: n=2, x=0; w=2: n=2, x=2: p=.5, T=4, E=3, V=.25*(10-36/4)=.25
    // -> z = (4-3)/0.5 = 2
    val orders = Seq(
      o(1, "1-URGENT", "O"), o(2, "1-URGENT", "P"),
      o(3, "2-HIGH", "F"), o(4, "2-HIGH", "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r = Inference.cochranArmitage(orders).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4 && r.getLong(2) == 4,
      r.toString)
    assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 2.0, r.toString)
    // every order fulfilled: p = 1 -> zero variance -> NULL z
    val flat = Seq(o(1, "1-URGENT", "F"), o(2, "2-HIGH", "F"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val r0 = Inference.cochranArmitage(flat).collect().head
    assert(r0.isNullAt(4), r0.toString)
  }
}
