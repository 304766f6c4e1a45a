package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev-only: per-query split of WARM wall time into frame
  * construction (Scala DSL + any in-build actions), the final write's
  * Catalyst phases (analysis / optimization / physical planning, via
  * QueryPlanningTracker), and everything else (codegen + execution).
  * Finds whether the flat ~0.35 s bench tail is paying a uniform
  * driver-side planning tax (guide §7.3: very large plans spend
  * driver time in Optimizer/RuleExecutor) that per-operator work
  * cannot see. Run:
  * `sbt "Test/runMain graft.PlanTimeProbe [q1,q2,...]"`. */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").toSet).getOrElse(Set.empty[String])
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // capture the LAST completed QueryExecution's tracker phases —
    // the noop write's QE is the final one per query
    @volatile var lastPhases: Map[String, Long] = Map.empty
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        lastPhases = qe.tracker.phases.map { case (k, v) => k -> (v.endTimeMs - v.startTimeMs) }.toMap
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    // warmup pass (codegen caches, artifacts, parquet footers)
    qs.foreach { case (_, f) =>
      try f(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"[plantime] ${"query"}%-28s ${"constr"}%7s ${"analyz"}%7s ${"optim"}%7s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s  (ms, warm)")
    var (sC, sA, sO, sP, sE, sT) = (0L, 0L, 0L, 0L, 0L, 0L)
    var n = 0
    qs.foreach { case (name, f) =>
      try {
        val t0 = System.nanoTime()
        val df = f(spark, sfDir)
        val tBuilt = System.nanoTime()
        lastPhases = Map.empty
        df.write.format("noop").mode("overwrite").save()
        val tDone = System.nanoTime()
        // listener fires synchronously on the calling thread's
        // onSuccess path in local mode after a short drain
        Thread.sleep(30)
        val constr = (tBuilt - t0) / 1000000L
        val total = (tDone - t0) / 1000000L
        val an = lastPhases.getOrElse("analysis", 0L)
        val op = lastPhases.getOrElse("optimization", 0L)
        val pl = lastPhases.getOrElse("planning", 0L)
        val exec = total - constr - an - op - pl
        println(f"[plantime] $name%-28s $constr%7d $an%7d $op%7d $pl%7d $exec%7d $total%7d")
        sC += constr; sA += an; sO += op; sP += pl; sE += exec; sT += total; n += 1
      } catch { case e: Throwable =>
        println(s"[plantime] $name FAILED: ${e.getMessage}") }
    }
    println(f"[plantime] ${s"TOTAL ($n)"}%-28s $sC%7d $sA%7d $sO%7d $sP%7d $sE%7d $sT%7d")
    spark.stop()
  }
}
