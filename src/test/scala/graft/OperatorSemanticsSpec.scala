package graft

import org.apache.spark.sql.functions._

/** Targeted semantic assertions per operator family — pinned facts a
  * wrong implementation would break, independent of the DuckDB oracle.
  */
class OperatorSemanticsSpec extends SparkTestBase {

  test("q_filter_time_range honors inclusive month bounds") {
    val df = SparkEntry.queries("q_filter_time_range")(spark, sf)
    val bad = df.filter(
      (col("year") < 1996 || (col("year") === 1996 && col("month") < 2)) ||
      (col("year") > 1999 || (col("year") === 1999 && col("month") > 10))).count()
    assert(bad == 0)
    // boundary months present (data spans 1995..2001)
    assert(df.filter(col("year") === 1996 && col("month") === 2).count() > 0)
    assert(df.filter(col("year") === 1999 && col("month") === 10).count() > 0)
  }

  test("observe() collects validation counts in the SAME pass as the query") {
    // the reference prints row counts before/after each filter stage
    // as a separate len(df) per stage (precipitation_pipeline.py:
    // 106-109, :167); Observation attaches the counts to the one
    // flagship pass — zero extra scans, zero extra actions
    val obs = new org.apache.spark.sql.Observation("validation")
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_quantity").isNotNull)
      .observe(obs,
        count(lit(1)).as("n_after_null_filter"),
        sum(when(operators.Climate.timestampRange(
          col("l_shipdate"), 1996, 2, 1999, 10), 1).otherwise(0)).as("n_in_range"))
    val kept = li.filter(operators.Climate.timestampRange(
      col("l_shipdate"), 1996, 2, 1999, 10)).count()
    val m = obs.get
    assert(m("n_in_range") == kept)
    assert(m("n_after_null_filter").asInstanceOf[Long] >= kept)
  }

  test("q_agg_group_monthly sums match a direct recomputation") {
    val df = SparkEntry.queries("q_agg_group_monthly")(spark, sf)
    val total = df.agg(sum("n_rows")).head.getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_quantity").isNotNull)
      .filter(year(col("l_shipdate")).between(1996, 1999))
      .filter(!(year(col("l_shipdate")) === 1996 && month(col("l_shipdate")) < 2))
      .filter(!(year(col("l_shipdate")) === 1999 && month(col("l_shipdate")) > 10))
      .count()
    assert(total == expected)
  }

  test("grid resolution returns the default on constant input") {
    import spark.implicits._
    val one = Seq(1.5, 1.5, 1.5).toDF("coord")
    val res = operators.Climate.gridResolution(one, "coord", 0.5)
      .head.getDouble(0)
    assert(res == 0.5)
  }

  test("grid resolution finds the min gap") {
    import spark.implicits._
    val df = Seq(0.0, 0.5, 1.5, 2.0).toDF("coord")
    val res = operators.Climate.gridResolution(df, "coord", 9.9)
      .head.getDouble(0)
    assert(res == 0.5)
  }

  test("semi and anti join partition the left relation") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti == c.count())
  }

  test("as-of join: matched_ts is the max view ts <= purchase ts") {
    val res = SparkEntry.queries("q_join_asof")(spark, sf)
    val e = Tables.events(spark, sf)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    // brute-force recompute on the small sf for 20 sampled purchases
    val sample = res.limit(20).collect()
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getTimestamp(2))).toMap
    val vrows = views.collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    sample.foreach { r =>
      val (user, pts) = purchases(r.getLong(0))
      val expect = vrows.filter(v => v._1 == user && !v._2.after(pts))
        .map(_._2).sortBy(_.getTime).lastOption.orNull
      assert(r.getTimestamp(2) == expect,
        s"event ${r.getLong(0)}: got ${r.getTimestamp(2)}, want $expect")
    }
  }

  test("union_all preserves cardinality; union_distinct dedups") {
    val ua = SparkEntry.queries("q_union_all")(spark, sf).count()
    val c = Tables.customer(spark, sf).count()
    val s2 = Tables.supplier(spark, sf).count()
    assert(ua == c + s2)
  }

  test("topk equals sort-limit") {
    val topk = SparkEntry.queries("q_topk")(spark, sf).collect().map(_.getLong(0))
    val sorted = Tables.orders(spark, sf)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).collect().map(_.getLong(0))
    assert(topk.sameElements(sorted))
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .head.getLong(0).toDouble
    val exact = Tables.lineitem(spark, sf)
      .select(countDistinct(col("l_partkey"))).head.getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
