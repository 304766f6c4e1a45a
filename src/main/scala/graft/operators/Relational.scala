package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Core relational surface: scans, projections, filters, conditional
  * projection, sorts/limits/top-k, set operations (SURVEY §2.1, §2.2,
  * §2.6, §2.7).
  *
  * Reference semantics: column projection
  * (pipelines/precipitation_pipeline.py:139), NULL elimination
  * (precipitation_pipeline.py:107), numeric-string validation gate
  * (pipelines/population_pipeline.py:44-45), conditional defaults
  * (precipitation_pipeline.py:174-182), sorted emission
  * (precipitation_pipeline.py:170-171), multi-source union analog
  * (utils/pipeline_manager.py:236-250).
  *
  * Scale posture: projections + filters are pushed into the parquet
  * scan by Catalyst (PushedFilters/ReadSchema — asserted in
  * src/test/scala/graft/PlanSpec.scala); sorts are range-partitioned
  * spillable SortExec; top-k
  * plans as TakeOrderedAndProject (no global sort materialization);
  * set ops are hash-partitioned shuffles with partial aggregation.
  */
object Relational {

  /** 2-D SKYLINE (Pareto frontier) per brand: parts not DOMINATED on
    * (retailprice, size) — q dominates p iff q is ≤ on both and
    * strictly < on at least one (the classic "cheap AND small"
    * multi-objective shortlist no single ORDER BY can produce;
    * Börzsönyi et al. 2001). Duplicate (price, size) points dominate
    * neither way and both survive.
    *
    * The window formulation replaces the quadratic NOT EXISTS: within
    * a brand sorted by (price, size, key), every strictly-preceding
    * row already has price ≤ current, so p is dominated iff some
    * preceding row has size < p's, OR size = p's with price strictly
    * smaller — exactly the min(struct(size, price)) over the
    * preceding frame. Comparisons only (no arithmetic): engine-exact
    * on any input.
    *
    * Scale posture: ONE brand-key window shuffle, linear per block
    * (the oracle's NOT EXISTS is the O(n²) semantics check, not the
    * plan); brand blocks are catalog-bounded. A single-group skyline
    * at relation scale would escalate to the distributed prefix-sum
    * staging. */
  def skyline2d(part: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice"), col("p_size"), col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    part.select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("p_size"))
      .withColumn("m", min(struct(col("p_size").as("sz"),
        col("p_retailprice").as("pr"))).over(w))
      .filter(col("m").isNull || col("m.sz") > col("p_size") ||
        (col("m.sz") === col("p_size") && col("m.pr") === col("p_retailprice")))
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("p_size"))
      .orderBy(col("p_brand"), col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    // Pareto frontier on (price, size) per brand — the multi-objective
    // shortlist
    "q_skyline" -> ((s, d) => skyline2d(Tables.part(s, d))),
    // Full-table columnar scan. Pushdown-friendly: no transformation,
    // only a deterministic total order for the compare.
    "q_scan_parquet" -> ((s, d) =>
      Tables.orders(s, d).orderBy(col("o_orderkey"))),

    // UNPIVOT / melt — the inverse of q_pivot: wide numeric attribute
    // columns to long (id, attr, val) rows, the tidy-data reshape
    // every feature pipeline needs before per-attribute aggregation.
    // Spark's native Dataset.unpivot plans as a single Expand
    // projection (one pass, rows × attrs output, no shuffle, no join
    // — the same operator grouping sets lower to); the only exchange
    // is the deterministic output order.
    "q_unpivot" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "attr", "val")
        .orderBy(col("p_partkey"), col("attr"))),

    // SQL front end: the same engine surface through spark.sql — a
    // TPC-H-Q1-shaped pricing summary compiled by the SQL parser into
    // the identical Catalyst plan the DataFrame API would build
    // (scan-pruned, partial-aggregated). The temp view is per-call
    // unique and dropped immediately after analysis (spark.sql
    // analyzes eagerly, inlining the view into the plan), so
    // concurrent invocations with different sfDirs never share state.
    "q_sql_entry" -> ((s, d) => {
      val view = s"graft_sql_lineitem_${java.util.UUID.randomUUID().toString.take(8)}"
      Tables.lineitem(s, d).createOrReplaceTempView(view)
      try s.sql(s"""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                  AS sum_qty,
               round(sum(l_extendedprice), 2)                             AS sum_base,
               round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc,
               round(avg(l_quantity), 4)                                  AS avg_qty,
               count(*)                                                   AS n
        FROM $view
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")
      finally s.catalog.dropTempView(view)
    }),

    // Projection: ReadSchema should contain exactly these 3 columns.
    "q_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))),

    // NULL elimination on the measure (dropna analog).
    "q_filter_not_null" -> ((s, d) =>
      Tables.orders(s, d).na.drop(Seq("o_totalprice"))
        .filter(col("o_totalprice") > 100000.0)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Numeric-string validation gate before a safe cast.
    "q_filter_regex" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderpriority").rlike("^[0-9]+-"))
        .select(col("o_orderkey"),
          split(col("o_orderpriority"), "-").getItem(0).cast("int").as("prio_num"))
        .orderBy(col("o_orderkey"))),

    // Conditional projection with fallback default.
    "q_case_when" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, lit("debt"))
            .when(col("c_acctbal") < 5000, lit("low"))
            .otherwise(lit("high")).as("band"))
        .orderBy(col("c_custkey"))),

    // Global sort: range partition + spillable external sort.
    "q_sort" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))),

    "q_limit" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey")).limit(100)),

    // Top-k: plans as TakeOrderedAndProject — per-partition heap then
    // driver merge of k rows, never a full global sort.
    "q_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)),

    // Set operations over schema-aligned projections; `src` tag keeps
    // the union order-checkable.
    "q_union_all" -> ((s, d) =>
      Tables.customer(s, d).select(lit("c").as("src"), col("c_custkey").as("k"))
        .unionByName(
          Tables.supplier(s, d).select(lit("s").as("src"), col("s_suppkey").as("k")))
        .orderBy(col("src"), col("k"))),

    "q_union_distinct" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .unionByName(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy(col("nk"))),

    "q_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))),

    "q_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))),
  )

  val oracle: Map[String, String] = Map(
    // INDEPENDENT formulation: literal quadratic NOT EXISTS dominance
    // — cross-checks the engine's linear window trick
    "q_skyline" ->
      """SELECT p_brand, p_partkey, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_brand = p.p_brand
        |    AND q.p_retailprice <= p.p_retailprice
        |    AND q.p_size <= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
        |ORDER BY p_brand, p_partkey""".stripMargin,
    // independent formulation: stacked UNION ALL instead of UNPIVOT
    "q_unpivot" ->
      """SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'retailprice', p_retailprice FROM part
        |ORDER BY p_partkey, attr""".stripMargin,
    "q_scan_parquet" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "q_sql_entry" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem ORDER BY 1, 2, 3""".stripMargin,
    "q_filter_not_null" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice IS NOT NULL AND o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_regex" ->
      """SELECT o_orderkey,
        |       CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num
        |FROM orders
        |WHERE regexp_matches(o_orderpriority, '^[0-9]+-')
        |ORDER BY o_orderkey""".stripMargin,
    "q_case_when" ->
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN 'debt'
        |            WHEN c_acctbal < 5000 THEN 'low'
        |            ELSE 'high' END AS band
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q_limit" ->
      "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 100",
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_union_all" ->
      """SELECT 'c' AS src, c_custkey AS k FROM customer
        |UNION ALL
        |SELECT 's' AS src, s_suppkey AS k FROM supplier
        |ORDER BY src, k""".stripMargin,
    "q_union_distinct" ->
      """SELECT DISTINCT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY nk""".stripMargin,
    "q_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "q_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
  )
}
