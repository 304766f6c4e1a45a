package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL front-end parity: the SQL parser and the DataFrame API compile
  * to the SAME Catalyst plan for each core operator family — extending
  * the q_sql_entry pattern from one query to the surface. Equality is
  * asserted on canonicalized plans (exprIds normalized) at both the
  * optimized-logical and physical levels: not "same rows", the same
  * PLAN — so every PlanSpec scale property (pushdown, broadcast,
  * top-k strategy) transfers to the SQL path for free.
  */
class SqlParitySpec extends SparkTestBase {

  /** Drop ProjectExec nodes that emit exactly their child's output (a
    * zero-cost pass-through — whole-stage codegen fuses it away): the
    * SQL analyzer sometimes leaves one where the Dataset API doesn't,
    * and it is the ONLY shape difference tolerated here. */
  private def stripNoopProject(
      p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
    p.transformUp {
      case proj: org.apache.spark.sql.execution.ProjectExec
        if proj.projectList.forall(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) &&
          proj.projectList.map(_.toAttribute.exprId) == proj.child.output.map(_.exprId) =>
        proj.child
    }

  private def assertSamePlans(df: DataFrame, sqlText: String, family: String,
      modNoopProject: Boolean = false): Unit = {
    val viaSql = spark.sql(sqlText)
    val lDf = df.queryExecution.optimizedPlan.canonicalized
    val lSql = viaSql.queryExecution.optimizedPlan.canonicalized
    assert(lDf == lSql,
      s"$family: optimized plans differ\nDF:\n$lDf\nSQL:\n$lSql")
    // strip AFTER canonicalization: the adaptive wrapper exposes no
    // children to transformUp, but its canonicalized form does
    def phys(d: DataFrame) = {
      val p = d.queryExecution.executedPlan.canonicalized
      if (modNoopProject) stripNoopProject(p) else p
    }
    val pDf = phys(df)
    val pSql = phys(viaSql)
    assert(pDf == pSql,
      s"$family: physical plans differ\nDF:\n$pDf\nSQL:\n$pSql")
  }

  private def withViews(body: => Unit): Unit = {
    Tables.lineitem(spark, sf).createOrReplaceTempView("sp_lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("sp_orders")
    Tables.customer(spark, sf).createOrReplaceTempView("sp_customer")
    Tables.nation(spark, sf).createOrReplaceTempView("sp_nation")
    try body
    finally Seq("sp_lineitem", "sp_orders", "sp_customer", "sp_nation")
      .foreach(spark.catalog.dropTempView)
  }

  test("filter + projection: identical plans from SQL and the DataFrame API") {
    withViews {
      assertSamePlans(
        Tables.lineitem(spark, sf)
          .filter(col("l_quantity") > 10)
          .select(col("l_orderkey"), col("l_extendedprice")),
        "SELECT l_orderkey, l_extendedprice FROM sp_lineitem WHERE l_quantity > 10",
        "filter+project")
    }
  }

  test("aggregation: identical plans") {
    withViews {
      assertSamePlans(
        Tables.lineitem(spark, sf)
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n")),
        """SELECT l_returnflag, sum(l_quantity) AS s, count(1) AS n
          |FROM sp_lineitem GROUP BY l_returnflag""".stripMargin,
        "aggregation")
    }
  }

  test("broadcast join: identical plans (hint included)") {
    withViews {
      val c = Tables.customer(spark, sf)
      val n = Tables.nation(spark, sf)
      assertSamePlans(
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .select(col("c_custkey"), col("n_name")),
        """SELECT /*+ BROADCAST(n) */ c_custkey, n_name
          |FROM sp_customer c JOIN sp_nation n ON c_nationkey = n_nationkey""".stripMargin,
        "broadcast join")
    }
  }

  test("window function: identical plans") {
    withViews {
      assertSamePlans(
        Tables.orders(spark, sf).select(col("o_custkey"), col("o_totalprice"),
          rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice"))).as("r")),
        """SELECT o_custkey, o_totalprice,
          |       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS r
          |FROM sp_orders""".stripMargin,
        "window", modNoopProject = true)
    }
  }

  test("global sort: identical plans") {
    withViews {
      assertSamePlans(
        Tables.orders(spark, sf)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey")),
        """SELECT o_orderkey, o_totalprice FROM sp_orders
          |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
        "global sort", modNoopProject = true)
    }
  }

  test("scalar-function projection: identical plans") {
    withViews {
      assertSamePlans(
        Tables.orders(spark, sf).select(
          year(col("o_orderdate")).as("y"),
          upper(col("o_orderpriority")).as("p"),
          (col("o_totalprice") * 2).as("t2")),
        """SELECT year(o_orderdate) AS y, upper(o_orderpriority) AS p,
          |       o_totalprice * 2 AS t2 FROM sp_orders""".stripMargin,
        "scalar projection")
    }
  }

  test("top-k (order by + limit): identical plans") {
    withViews {
      assertSamePlans(
        Tables.orders(spark, sf)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc).limit(10),
        """SELECT o_orderkey, o_totalprice FROM sp_orders
          |ORDER BY o_totalprice DESC LIMIT 10""".stripMargin,
        "top-k")
    }
  }

  test("set operation (UNION distinct): identical plans") {
    withViews {
      val a = Tables.orders(spark, sf).select(col("o_custkey"))
      val b = Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey"))
      assertSamePlans(
        a.union(b).distinct(),
        """SELECT o_custkey FROM sp_orders
          |UNION
          |SELECT c_custkey AS o_custkey FROM sp_customer""".stripMargin,
        "union-distinct", modNoopProject = true)
    }
  }
}
