package graft.operators

import graft.{halfUp, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical-inference operators round 2 (SURVEY §2.13 additions):
  * one-way ANOVA, Kruskal–Wallis, Kaplan–Meier survival, and
  * Jensen–Shannon drift — the experiment-readout and distribution-
  * drift battery next to the existing t/z (q_ab_test), rank-sum
  * (q_stats_mannwhitney), signed-rank (q_stats_wilcoxon), KS
  * (q_drift_ks) and PSI (q_drift_psi) screens.
  *
  * House parity posture throughout: raw values quantize to integer
  * cents, every count/sum/sum-of-squares is an exact BIGINT (order-
  * free — partitioning can never change a digit), and only the final
  * per-group statistic chain touches doubles, mirrored operand-for-
  * operand in the DuckDB twin and rendered via halfUp. Sequential
  * recurrences (the survival curve's cumulative product) follow the
  * holtTrend posture: calendar-bounded packed-array fold on the
  * engine side, recursive-CTE replay in the oracle, identical
  * multiply order.
  */
object Inference {

  private def cents(c: Column): Column =
    floor(c * lit(100) + lit(0.5)).cast("long")

  /** ONE-WAY ANOVA across the event-type arms: F = (SSB/(k−1)) /
    * (SSW/(N−k)) over the quantized per-event values — "does ANY arm
    * differ?", the k-sample gate run before pairwise tests. SSB/SSW
    * derive from exact per-group (n, Σx, Σx²) BIGINT moments in cents
    * (cents² ≤ ~3.2e9 per row — the sum stays under 2⁶³ past 10⁹
    * rows); the Σ s_j²/n_j chain is per-group doubles summed over the
    * bounded arm set (the q_agg_entropy posture: plain sum + halfUp,
    * wobble bounded by arm cardinality).
    *
    * Scale: one counts-only hash aggregate to k rows, then a k-row
    * reduction — nothing after the first aggregate sees data. */
  def anovaOneWay(events: DataFrame): DataFrame = {
    val g = events.filter(col("value").isNotNull)
      .select(col("event_type").as("grp"), cents(col("value")).as("c"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
    val sD = col("s").cast("double")
    val m = g.agg(
      count(lit(1)).as("k"), sum(col("n")).as("n"),
      sum(col("s")).as("st"), sum(col("q")).as("qt"),
      sum(sD * sD / col("n").cast("double")).as("a"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val stD = col("st").cast("double")
    // cents² → value²: /1e4
    val ssb = (col("a") - stD * stD / nD) / lit(1e4)
    val ssw = (col("qt").cast("double") - col("a")) / lit(1e4)
    m.select(col("k").as("n_groups"), col("n"),
      halfUp(ssb, 4).as("ss_between"),
      halfUp(ssw, 4).as("ss_within"),
      halfUp(when(col("k") < 2 || col("n") <= col("k") || ssw <= 0.0,
          lit(null).cast("double"))
        .otherwise((ssb / (kD - lit(1.0))) / (ssw / (nD - kD))), 6)
        .as("f_stat"))
  }

  private[operators] val anovaOracleSql: String =
    """WITH v AS (
      |  SELECT event_type AS grp,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL),
      |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(c) AS BIGINT) AS s,
      |             CAST(sum(c * c) AS BIGINT) AS q
      |      FROM v GROUP BY 1),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |             CAST(sum(n) AS BIGINT) AS n,
      |             CAST(sum(s) AS BIGINT) AS st,
      |             CAST(sum(q) AS BIGINT) AS qt,
      |             sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |                 / CAST(n AS DOUBLE)) AS a
      |      FROM g)
      |SELECT k AS n_groups, n,
      |       floor(((a - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
      |               / CAST(n AS DOUBLE)) / 1e4) * 10000.0 + 0.5) / 10000.0
      |         AS ss_between,
      |       floor(((CAST(qt AS DOUBLE) - a) / 1e4) * 10000.0 + 0.5) / 10000.0
      |         AS ss_within,
      |       CASE WHEN k < 2 OR n <= k OR (CAST(qt AS DOUBLE) - a) / 1e4 <= 0
      |            THEN NULL
      |            ELSE floor((((a - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
      |                / CAST(n AS DOUBLE)) / 1e4 / (CAST(k AS DOUBLE) - 1.0))
      |              / ((CAST(qt AS DOUBLE) - a) / 1e4
      |                 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))
      |             * 1000000.0 + 0.5) / 1000000.0 END AS f_stat
      |FROM m""".stripMargin

  /** BROWN–FORSYTHE LEVENE test across the event-type arms: the
    * one-way F statistic computed on d = |x − median_j| — "are the
    * arm VARIANCES equal?", the homogeneity assumption [[anovaOneWay]]
    * quietly stands on, in its robust (median-centered) form. Group
    * medians are RANK-PICKED order statistics (the lower median at
    * rank ⌊(n+1)/2⌋ — an actual data value, engine-independent by
    * construction; interpolated medians differ across engines in the
    * last ulp), so every deviation is an exact BIGINT |cents − med|
    * and the F chain reuses the ANOVA moments posture unchanged.
    *
    * Scale: one ranked window partitioned by the bounded arm key for
    * the median pick (the winsorizedMean posture), medians broadcast
    * back, then the same counts-only aggregate as ANOVA. */
  def leveneBrownForsythe(events: DataFrame): DataFrame = {
    val v = events.filter(col("value").isNotNull)
      .select(col("event_type").as("grp"), cents(col("value")).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("c"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val med = graft.spread(v, col("c"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wg))
      .groupBy(col("grp"))
      // integer floor division: Spark's `/` on longs is FRACTIONAL
      // (n even → rank 100.5 matches nothing and the median nulls out)
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("c"))).as("med"))
    val g = v.join(broadcast(med), "grp")
      .select(col("grp"), abs(col("c") - col("med")).as("d"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("s"),
        sum(col("d") * col("d")).as("q"))
    val sD = col("s").cast("double")
    val m = g.agg(
      count(lit(1)).as("k"), sum(col("n")).as("n"),
      sum(col("s")).as("st"), sum(col("q")).as("qt"),
      sum(sD * sD / col("n").cast("double")).as("a"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val stD = col("st").cast("double")
    val ssb = (col("a") - stD * stD / nD) / lit(1e4)
    val ssw = (col("qt").cast("double") - col("a")) / lit(1e4)
    m.select(col("k").as("n_groups"), col("n"),
      halfUp(ssb, 4).as("ss_between"),
      halfUp(ssw, 4).as("ss_within"),
      halfUp(when(col("k") < 2 || col("n") <= col("k") || ssw <= 0.0,
          lit(null).cast("double"))
        .otherwise((ssb / (kD - lit(1.0))) / (ssw / (nD - kD))), 6)
        .as("w_stat"))
  }

  private[operators] val leveneOracleSql: String =
    """WITH v AS (
      |  SELECT event_type AS grp,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL),
      |r AS (SELECT grp, c,
      |             row_number() OVER (PARTITION BY grp ORDER BY c) AS rn,
      |             count(*) OVER (PARTITION BY grp) AS n
      |      FROM v),
      |med AS (SELECT grp, max(CASE WHEN rn = (n + 1) // 2 THEN c END) AS med
      |        FROM r GROUP BY 1),
      |d AS (SELECT v.grp, abs(v.c - med.med) AS d FROM v JOIN med USING (grp)),
      |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(d) AS BIGINT) AS s,
      |             CAST(sum(d * d) AS BIGINT) AS q
      |      FROM d GROUP BY 1),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |             CAST(sum(n) AS BIGINT) AS n,
      |             CAST(sum(s) AS BIGINT) AS st,
      |             CAST(sum(q) AS BIGINT) AS qt,
      |             sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
      |                 / CAST(n AS DOUBLE)) AS a
      |      FROM g)
      |SELECT k AS n_groups, n,
      |       floor(((a - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
      |               / CAST(n AS DOUBLE)) / 1e4) * 10000.0 + 0.5) / 10000.0
      |         AS ss_between,
      |       floor(((CAST(qt AS DOUBLE) - a) / 1e4) * 10000.0 + 0.5) / 10000.0
      |         AS ss_within,
      |       CASE WHEN k < 2 OR n <= k OR (CAST(qt AS DOUBLE) - a) / 1e4 <= 0
      |            THEN NULL
      |            ELSE floor((((a - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
      |                / CAST(n AS DOUBLE)) / 1e4 / (CAST(k AS DOUBLE) - 1.0))
      |              / ((CAST(qt AS DOUBLE) - a) / 1e4
      |                 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))
      |             * 1000000.0 + 0.5) / 1000000.0 END AS w_stat
      |FROM m""".stripMargin

  /** KRUSKAL–WALLIS H across the event-type arms — the rank-based
    * k-sample test (the heavy-tail-robust sibling of [[anovaOneWay]],
    * generalizing q_stats_mannwhitney past two arms), with the
    * standard tie correction. Ranks are INTEGER doubled average ranks
    * (r2 = 2·before + t + 1 over the global value census — the
    * spearman/wilcoxon posture, distributed via the census prefix
    * sum, never a partition-less row window); per-arm rank sums are
    * exact BIGINTs, ties Σ(t³−t) an exact BIGINT, and the H chain is
    * per-arm doubles over the bounded arm set.
    *
    * Scale: the census is value-domain-sized (≤ distinct cents),
    * broadcast back onto the stream; two counts-only aggregates. */
  def kruskalWallis(events: DataFrame): DataFrame = {
    val v = events.filter(col("value").isNotNull)
      .select(col("event_type").as("grp"), cents(col("value")).as("c"))
    val cen = v.groupBy(col("c")).agg(count(lit(1)).as("t"))
    val ranks = Windows.withGlobalPrefixSums(cen, Seq((col("t"), "cum")), col("c"))
      .select(col("c"), (lit(2L) * col("cum") - col("t") + lit(1L)).as("r2"))
    val grp = v.join(broadcast(ranks), "c")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("r2")).as("rr"))
    val ties = cen
      .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
        .as("tsum"))
    val rrD = col("rr").cast("double")
    val m = grp.agg(
      count(lit(1)).as("k"), sum(col("n")).as("n"),
      // (R_j)²/n_j = (r2_j/2)²/n_j
      sum(rrD * rrD / lit(4.0) / col("n").cast("double")).as("a"))
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + lit(1.0))) * col("a") -
      lit(3.0) * (nD + lit(1.0))
    val cCorr = lit(1.0) - col("tsum").cast("double") / (nD * nD * nD - nD)
    m.crossJoin(broadcast(ties))
      .select(col("k").as("n_groups"), col("n"),
        halfUp(h, 6).as("h"),
        halfUp(when(cCorr <= 0.0, lit(null).cast("double"))
          .otherwise(h / cCorr), 6).as("h_tie_corrected"))
  }

  private[operators] val kruskalOracleSql: String =
    """WITH v AS (
      |  SELECT event_type AS grp,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL),
      |cen AS (SELECT c, CAST(count(*) AS BIGINT) AS t FROM v GROUP BY 1),
      |r AS (SELECT c,
      |             2 * (CAST(sum(t) OVER (ORDER BY c) AS BIGINT) - t)
      |               + t + 1 AS r2
      |      FROM cen),
      |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(r2) AS BIGINT) AS rr
      |      FROM v JOIN r USING (c) GROUP BY 1),
      |ties AS (SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tsum
      |         FROM cen),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |             CAST(sum(n) AS BIGINT) AS n,
      |             sum(CAST(rr AS DOUBLE) * CAST(rr AS DOUBLE) / 4.0
      |                 / CAST(n AS DOUBLE)) AS a
      |      FROM g)
      |SELECT k AS n_groups, n,
      |       floor((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * a
      |              - 3.0 * (CAST(n AS DOUBLE) + 1.0)) * 1000000.0 + 0.5)
      |         / 1000000.0 AS h,
      |       CASE WHEN 1.0 - CAST(tsum AS DOUBLE)
      |                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |                    * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) <= 0
      |            THEN NULL
      |            ELSE floor(((12.0 / (CAST(n AS DOUBLE)
      |                  * (CAST(n AS DOUBLE) + 1.0)) * a
      |               - 3.0 * (CAST(n AS DOUBLE) + 1.0))
      |              / (1.0 - CAST(tsum AS DOUBLE)
      |                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |                    * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))))
      |             * 1000000.0 + 0.5) / 1000000.0 END AS h_tie_corrected
      |FROM m, ties""".stripMargin

  /** KAPLAN–MEIER survival curve of view→purchase conversion, one
    * curve per A/B arm (user_id % 2): per user, T = days from first
    * view to first subsequent purchase (event) or to the corpus's
    * last event date (right-censored — the user simply hasn't
    * converted YET, which a naive conversion-rate readout mistakes
    * for "never"). S(t) = Π_{u ≤ t, event days} (1 − d_u/n_u), the
    * product-limit estimator: d_u = conversions at day u, n_u = users
    * still at risk (T ≥ u).
    *
    * Parity: d/n are exact counts; the per-day risk set is an exact
    * prefix subtraction; the cumulative product is a SEQUENTIAL fold
    * in event-day order — packed-array aggregate on the engine side
    * (the holtTrend posture, with the same maxDays pre-flight),
    * recursive CTE stepping the same order in the oracle, so every
    * multiply pairs the identical IEEE doubles.
    *
    * Scale: facts reduce to one row per (arm, user) then one row per
    * (arm, day); the fold runs over the calendar-bounded event-day
    * list per arm (guarded), never over users. */
  def kaplanMeier(events: DataFrame, maxDays: Int = 36600): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val horizon = events.agg(max(to_date(col("ts"))).as("h"))
    val users = events
      .select((col("user_id") % 2).as("arm"), col("user_id"),
        col("event_type"), to_date(col("ts")).as("d"))
      .groupBy(col("arm"), col("user_id"))
      .agg(min(when(col("event_type") === "view", col("d"))).as("v0"))
      .filter(col("v0").isNotNull)
    val conv = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("pd"))
      .groupBy(col("user_id"))
      .agg(min(col("pd")).as("p0"))
    val spans = users.join(conv, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(col("arm"),
        when(col("p0").isNotNull && col("p0") >= col("v0"), lit(1L))
          .otherwise(lit(0L)).as("ev"),
        when(col("p0").isNotNull && col("p0") >= col("v0"),
          datediff(col("p0"), col("v0")).cast("long"))
          .otherwise(datediff(col("h"), col("v0")).cast("long")).as("t"))
    val byDay = spans.groupBy(col("arm"), col("t").as("day"))
      .agg(sum(col("ev")).as("d"), count(lit(1)).as("closed"))
    val wArm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("arm")).orderBy(col("day"))
      .rowsBetween(Window_unboundedPreceding, -1)
    val nArm = org.apache.spark.sql.expressions.Window.partitionBy(col("arm"))
    val risk = byDay
      .withColumn("total", sum(col("closed")).over(nArm))
      .withColumn("gone", coalesce(sum(col("closed")).over(wArm), lit(0L)))
      .withColumn("n", col("total") - col("gone"))
      .filter(col("d") > 0)
      .select(col("arm"), col("day"), col("d"), col("n"))
    val packed = risk.groupBy(col("arm"))
      .agg(sort_array(collect_list(struct(col("day"), col("d"), col("n"))))
        .as("pts"))
      .withColumn("pts",
        when(size(col("pts")) > maxDays, raise_error(concat(
          lit("kaplanMeier: arm "), col("arm").cast("string"),
          lit(" has "), size(col("pts")).cast("string"),
          lit(s" event days > maxDays=$maxDays — fix the input or raise " +
            "maxDays explicitly")))).otherwise(col("pts")))
    // sequential product-limit fold, emitting S after each event day
    val folded = packed.select(col("arm"), col("pts"), expr(
      """aggregate(pts,
        |  struct(CAST(1.0 AS DOUBLE) AS s, CAST(array() AS ARRAY<DOUBLE>) AS o),
        |  (acc, x) -> struct(
        |    acc.s * (1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE)),
        |    concat(acc.o, array(
        |      acc.s * (1.0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))))),
        |  acc -> acc.o)""".stripMargin).as("sv"))
    folded
      .select(col("arm"), posexplode(arrays_zip(col("pts"), col("sv"))))
      .select(col("arm"), col("col.pts.day").as("day"),
        col("col.pts.n").as("n_risk"), col("col.pts.d").as("n_events"),
        halfUp(col("col.sv"), 6).as("survival"))
      .orderBy(col("arm"), col("day"))
  }

  private[operators] val kaplanMeierOracleSql: String =
    """WITH RECURSIVE h AS (
      |  SELECT max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS hd FROM events),
      |u AS (
      |  SELECT user_id % 2 AS arm, user_id,
      |         min(CASE WHEN event_type = 'view'
      |                  THEN CAST(CAST(ts AS TIMESTAMP) AS DATE) END) AS v0
      |  FROM events GROUP BY 1, 2 HAVING v0 IS NOT NULL),
      |c AS (
      |  SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS p0
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |spans AS (
      |  SELECT u.arm,
      |         CASE WHEN c.p0 IS NOT NULL AND c.p0 >= u.v0 THEN 1 ELSE 0 END AS ev,
      |         CASE WHEN c.p0 IS NOT NULL AND c.p0 >= u.v0
      |              THEN CAST(date_diff('day', u.v0, c.p0) AS BIGINT)
      |              ELSE CAST(date_diff('day', u.v0, h.hd) AS BIGINT) END AS t
      |  FROM u LEFT JOIN c USING (user_id), h),
      |byday AS (
      |  SELECT arm, t AS day, CAST(sum(ev) AS BIGINT) AS d,
      |         CAST(count(*) AS BIGINT) AS closed
      |  FROM spans GROUP BY 1, 2),
      |risk AS (
      |  SELECT arm, day, d,
      |         CAST(sum(closed) OVER (PARTITION BY arm) AS BIGINT)
      |           - CAST(coalesce(sum(closed) OVER (PARTITION BY arm
      |               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
      |               AND 1 PRECEDING), 0) AS BIGINT) AS n
      |  FROM byday),
      |ev AS (
      |  SELECT arm, day, d, n,
      |         row_number() OVER (PARTITION BY arm ORDER BY day) AS i
      |  FROM risk WHERE d > 0),
      |rec(arm, i, day, d, n, s) AS (
      |  SELECT arm, i, day, d, n,
      |         1.0 * (1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
      |  FROM ev WHERE i = 1
      |  UNION ALL
      |  SELECT e.arm, e.i, e.day, e.d, e.n,
      |         r.s * (1.0 - CAST(e.d AS DOUBLE) / CAST(e.n AS DOUBLE))
      |  FROM rec r JOIN ev e ON e.arm = r.arm AND e.i = r.i + 1)
      |SELECT arm, day, n AS n_risk, d AS n_events,
      |       floor(s * 1000000.0 + 0.5) / 1000000.0 AS survival
      |FROM rec ORDER BY arm, day""".stripMargin

  /** JARQUE–BERA normality screen per group: JB = n/6·(S² + K²/4)
    * from the standardized third/fourth moments — "is this group's
    * distribution even roughly normal?", the gate before leaning on
    * any normal-theory readout (q_ab_test's z, [[anovaOneWay]]'s F);
    * JB ~ χ²(2) under normality, so values past ~6 reject at 5%.
    * Same two-pass z-score formulation as q_agg_moments (windowed
    * mean/stddev, then per-group z-power averages — the proven
    * moments parity posture: double sums absorbed by the rendering),
    * with S/K feeding JB unrounded. Degenerate groups (zero variance,
    * n < 4) read NULL, never a blowup.
    *
    * Scale: one group-key window + one counts-only aggregate. */
  def jarqueBera(df: DataFrame, group: Column, value: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val z = ((col("v") - avg(col("v")).over(w)) /
      stddev_samp(col("v")).over(w)).as("z")
    val m = df.select(group.as("grp"), value.as("v"))
      .select(col("grp"), z)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        avg(col("z") * col("z") * col("z")).as("s"),
        (avg(col("z") * col("z") * col("z") * col("z")) - lit(3.0)).as("k"))
    val nD = col("n").cast("double")
    m.select(col("grp"), col("n"),
        halfUp(col("s"), 4).as("skewness"),
        halfUp(col("k"), 4).as("kurtosis_excess"),
        halfUp(when(col("n") < 4L || col("s").isNull, lit(null).cast("double"))
          .otherwise(nD / lit(6.0) *
            (col("s") * col("s") + col("k") * col("k") / lit(4.0))), 4)
          .as("jb"))
      .orderBy(col("grp"))
  }

  private[operators] val jarqueBeraOracleSql: String =
    """WITH w AS (
      |  SELECT c_nationkey AS grp,
      |         (c_acctbal - avg(c_acctbal) OVER g)
      |           / stddev_samp(c_acctbal) OVER g AS z
      |  FROM customer WINDOW g AS (PARTITION BY c_nationkey)),
      |m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |             avg(z * z * z) AS s,
      |             avg(z * z * z * z) - 3.0 AS k
      |      FROM w GROUP BY grp)
      |SELECT grp, n,
      |       floor(s * 10000.0 + 0.5) / 10000.0 AS skewness,
      |       floor(k * 10000.0 + 0.5) / 10000.0 AS kurtosis_excess,
      |       CASE WHEN n < 4 THEN NULL
      |            ELSE floor(CAST(n AS DOUBLE) / 6.0 * (s * s + k * k / 4.0)
      |                       * 10000.0 + 0.5) / 10000.0 END AS jb
      |FROM m ORDER BY grp""".stripMargin

  /** JENSEN–SHANNON divergence between the view and purchase value
    * distributions over a fixed 24-bucket grid (25-wide bins, top
    * bucket open) — the symmetric, bounded (≤ ln 2) drift readout
    * next to q_drift_ks's sup-gap and q_drift_psi's bucketed log
    * ratio; JS stays finite when a bucket empties on one side, which
    * is exactly where PSI blows up. Bucket counts are exact BIGINTs
    * from one conditional aggregate; the p·ln(p/m) chain is per-bucket
    * doubles summed over the fixed bucket set (the entropy posture).
    *
    * Scale: one counts-only hash aggregate to ≤ 24 rows. */
  def jensenShannon(events: DataFrame, typeA: String, typeB: String):
      DataFrame = {
    val b = events.filter(col("value").isNotNull &&
        col("event_type").isin(typeA, typeB))
      .select(col("event_type").as("et"),
        least(floor(col("value") / lit(25.0)), lit(23.0)).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("et") === typeA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("et") === typeB, 1L).otherwise(0L)).as("cb"))
    val tot = b.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val p = col("ca").cast("double") / col("na").cast("double")
    val q = col("cb").cast("double") / col("nb").cast("double")
    val m = (p + q) / lit(2.0)
    val term =
      when(col("ca") > 0L, p * log(p / m)).otherwise(lit(0.0)) +
      when(col("cb") > 0L, q * log(q / m)).otherwise(lit(0.0))
    b.crossJoin(broadcast(tot))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        count(lit(1)).as("n_bins"),
        halfUp(sum(term) / lit(2.0), 6).as("js_divergence"))
  }

  private[operators] val jensenShannonOracleSql: String =
    """WITH v AS (
      |  SELECT event_type AS et,
      |         CAST(least(floor(value / 25.0), 23.0) AS BIGINT) AS bin
      |  FROM events
      |  WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
      |b AS (SELECT bin,
      |             CAST(sum(CASE WHEN et = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |             CAST(sum(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |      FROM v GROUP BY 1),
      |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |               CAST(sum(cb) AS BIGINT) AS nb FROM b),
      |t AS (SELECT b.ca, b.cb, tot.na, tot.nb,
      |             (CASE WHEN b.ca > 0 THEN
      |                (CAST(b.ca AS DOUBLE) / CAST(tot.na AS DOUBLE))
      |                * ln((CAST(b.ca AS DOUBLE) / CAST(tot.na AS DOUBLE))
      |                     / ((CAST(b.ca AS DOUBLE) / CAST(tot.na AS DOUBLE)
      |                         + CAST(b.cb AS DOUBLE) / CAST(tot.nb AS DOUBLE))
      |                        / 2.0)) ELSE 0.0 END
      |              + CASE WHEN b.cb > 0 THEN
      |                (CAST(b.cb AS DOUBLE) / CAST(tot.nb AS DOUBLE))
      |                * ln((CAST(b.cb AS DOUBLE) / CAST(tot.nb AS DOUBLE))
      |                     / ((CAST(b.ca AS DOUBLE) / CAST(tot.na AS DOUBLE)
      |                         + CAST(b.cb AS DOUBLE) / CAST(tot.nb AS DOUBLE))
      |                        / 2.0)) ELSE 0.0 END) AS term
      |      FROM b, tot)
      |SELECT max(na) AS n_a, max(nb) AS n_b,
      |       CAST(count(*) AS BIGINT) AS n_bins,
      |       floor(sum(term) / 2.0 * 1000000.0 + 0.5) / 1000000.0
      |         AS js_divergence
      |FROM t""".stripMargin

  // Window.unboundedPreceding without the import collision
  private val Window_unboundedPreceding: Long =
    org.apache.spark.sql.expressions.Window.unboundedPreceding

  val queries: Map[String, Q] = Map(
    // k-sample variance decomposition across the event-type arms
    "q_stats_anova" -> ((s, d) => anovaOneWay(Tables.events(s, d))),
    // rank-based k-sample test with tie correction, same arms
    "q_stats_kruskal" -> ((s, d) => kruskalWallis(Tables.events(s, d))),
    // variance-homogeneity gate for the ANOVA (median-centered form)
    "q_stats_levene" -> ((s, d) => leveneBrownForsythe(Tables.events(s, d))),
    // normality screen per nation over account balances (the
    // q_agg_moments grouping, plus the chi-square-2 readout)
    "q_stats_jarque_bera" -> ((s, d) =>
      jarqueBera(Tables.customer(s, d), col("c_nationkey"), col("c_acctbal"))),
    // product-limit view→purchase conversion curves per A/B arm
    "q_stats_survival" -> ((s, d) => kaplanMeier(Tables.events(s, d))),
    // symmetric bounded drift between the view/purchase value mixes
    "q_drift_js" -> ((s, d) =>
      jensenShannon(Tables.events(s, d), "view", "purchase")),
  )

  val oracle: Map[String, String] = Map(
    "q_stats_anova" -> anovaOracleSql,
    "q_stats_kruskal" -> kruskalOracleSql,
    "q_stats_levene" -> leveneOracleSql,
    "q_stats_jarque_bera" -> jarqueBeraOracleSql,
    "q_stats_survival" -> kaplanMeierOracleSql,
    "q_drift_js" -> jensenShannonOracleSql,
  )
}
