package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Climate-pipeline composites: the reference's semantic core,
  * re-expressed as lazy column expressions so Catalyst plans one job
  * where the reference materialized per stage.
  *
  * Reference semantics covered here:
  *  - compound (year, month) time-range predicate
  *    (pipelines/precipitation_pipeline.py:66-70, temperature_pipeline.py:58-61)
  *  - year/month derivation (precipitation_pipeline.py:131-132)
  *  - monthly group aggregation — the reference's central groupby
  *    (precipitation_pipeline.py:134-141)
  *  - grid-resolution inference: min gap between consecutive sorted
  *    distinct coordinates, with a default fallback
  *    (precipitation_pipeline.py:170-182)
  *
  * Scale posture: the time filter over a raw timestamp is a plain
  * range predicate so it reaches parquet PushedFilters (row-group
  * skipping — see timestampRange); the monthly aggregation is a hash
  * aggregate with map-side partials; resolution inference never
  * leaves the cluster (no driver round-trip — the inferred scalar
  * flows through a 1-row aggregate).
  */
object Climate {

  /** The reference's exact boolean tree: rows within the inclusive
    * (y0,m0)..(y1,m1) month range (precipitation_pipeline.py:66-70).
    * Use this form ONLY when the inputs are already integer year/month
    * columns (e.g. hive partition columns, where it prunes partitions);
    * over a raw timestamp use [[timestampRange]] — a function-wrapped
    * predicate (year(ts) > …) cannot reach parquet PushedFilters.
    */
  def timeRange(y: Column, m: Column, y0: Int, m0: Int, y1: Int, m1: Int): Column =
    ((y > y0) || (y === y0 && m >= m0)) && ((y < y1) || (y === y1 && m <= m1))

  /** Identical month-range semantics expressed as a raw range on the
    * timestamp column itself: [first day of (y0,m0), first day of the
    * month AFTER (y1,m1)). The literals fold to timestamp constants, so
    * the predicate pushes into the parquet scan (row-group min/max
    * skipping) — at 100 TB this prunes the largest table's scan instead
    * of decoding every row (asserted in PlanSpec).
    */
  def timestampRange(ts: Column, y0: Int, m0: Int, y1: Int, m1: Int): Column = {
    val (ny, nm) = if (m1 == 12) (y1 + 1, 1) else (y1, m1 + 1)
    ts >= lit(f"$y0%04d-$m0%02d-01").cast("timestamp") &&
      ts < lit(f"$ny%04d-$nm%02d-01").cast("timestamp")
  }

  /** Derived year/month columns (precipitation_pipeline.py:131-132). */
  def withYearMonth(df: DataFrame, ts: String): DataFrame =
    df.withColumn("year", year(col(ts))).withColumn("month", month(col(ts)))

  /** Flagship slice (SURVEY §7.2): scan → time-range filter → null
    * filter → derive year/month → monthly aggregate → sort.
    * The reference runs this shape as 3 disk-materialized stages
    * (precipitation_pipeline.py:604-640); here it is one lazy plan.
    */
  def monthlyAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_quantity").isNotNull)
      .filter(timestampRange(col("l_shipdate"), 1996, 2, 1999, 10))
    withYearMonth(li, "l_shipdate")
      .groupBy(col("year"), col("month"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("year"), col("month"))
  }

  /** Grid-resolution inference (precipitation_pipeline.py:170-182):
    * distinct values → sorted neighbor gaps → min gap, with a default
    * when fewer than two distinct values exist. Distributed form:
    * distinct (shuffle) → single-partition window lag (the distinct
    * value set is tiny relative to input) → min + coalesce.
    */
  def gridResolution(df: DataFrame, coord: String, default: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(coord))
    df.select(col(coord)).distinct()
      .withColumn("gap", abs(col(coord) - lag(col(coord), 1).over(w)))
      .agg(coalesce(round(min(col("gap")), 4), lit(default)).as("resolution"))
  }

  val queries: Map[String, Q] = Map(
    "q_agg_group_monthly" -> (monthlyAgg _),
    "q_filter_time_range" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(timestampRange(col("l_shipdate"), 1996, 2, 1999, 10))
      withYearMonth(li, "l_shipdate")
        .select(col("l_orderkey"), col("l_linenumber"), col("year"), col("month"))
        // lineitem has no unique key in the harness data: total order over
        // every output column keeps the oracle compare deterministic.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("year"), col("month"))
    }),
    "q_derive_year_month" -> ((s, d) => {
      withYearMonth(Tables.orders(s, d), "o_orderdate")
        .select(col("o_orderkey"), col("year"), col("month"))
        .orderBy(col("o_orderkey"))
    }),
    "q_agg_min_diff" -> ((s, d) =>
      gridResolution(Tables.customer(s, d), "c_acctbal", 0.5)),
  )

  val oracle: Map[String, String] = Map(
    "q_agg_group_monthly" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS year, CAST(month(l_shipdate) AS INT) AS month,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_price,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_quantity IS NOT NULL
        |  AND ((year(l_shipdate) > 1996 OR (year(l_shipdate) = 1996 AND month(l_shipdate) >= 2))
        |   AND (year(l_shipdate) < 1999 OR (year(l_shipdate) = 1999 AND month(l_shipdate) <= 10)))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_filter_time_range" ->
      """SELECT l_orderkey, l_linenumber, CAST(year(l_shipdate) AS INT) AS year, CAST(month(l_shipdate) AS INT) AS month
        |FROM lineitem
        |WHERE ((year(l_shipdate) > 1996 OR (year(l_shipdate) = 1996 AND month(l_shipdate) >= 2))
        |   AND (year(l_shipdate) < 1999 OR (year(l_shipdate) = 1999 AND month(l_shipdate) <= 10)))
        |ORDER BY 1, 2, 3, 4""".stripMargin,
    "q_derive_year_month" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS year, CAST(month(o_orderdate) AS INT) AS month
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_agg_min_diff" ->
      """SELECT coalesce(round(min(gap), 4), 0.5) AS resolution FROM (
        |  SELECT abs(c_acctbal - lag(c_acctbal) OVER (ORDER BY c_acctbal)) AS gap
        |  FROM (SELECT DISTINCT c_acctbal FROM customer))""".stripMargin,
  )
}
