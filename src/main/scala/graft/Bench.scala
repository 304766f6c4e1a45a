package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * one JSON line of per-query seconds.
  *
  * Methodology: the timed action is a noop-format write — it executes
  * the FULL physical plan (including sorts and projections that
  * `count()` would let Catalyst prune away) without paying sink IO.
  * A complete untimed warmup pass runs first so JVM/JIT/codegen
  * warmup is not attributed to whichever query happens to run first;
  * round-over-round comparisons then measure plans, not warmup noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated name filter for targeted timing runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def exec(name: String, fn: Q): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // explicit pre-build of the bucketed tables: their one-time ingest
    // ("pay the distribution once at ingest") must never be attributed
    // to the timed pass — q_join_bucketed measures the ZERO-exchange
    // join, not the write that makes it possible
    if (only.forall(_.contains("q_join_bucketed")))
      try graft.operators.Joins.bucketedJoin(spark, sfDir)
      catch { case _: Throwable => () }
    // untimed warmup: full pass (codegen compile, parquet footer cache)
    queries.foreach { case (n, f) =>
      try exec(n, f) catch { case _: Throwable => () }
    }
    // a failed query reports -1, never a bogus "fast" time — silent
    // failure would read as a speedup in round-over-round comparisons.
    // MIN-OF-N timed passes: a background process on the machine can
    // inflate one pass, never all of them, so the min is the
    // contention-proof per-query time (a single-shot record once forged
    // a 22x phantom regression under builder contention).
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES").map(_.toInt).getOrElse(3)
    val results = queries.map { case (name, fn) =>
      val times = (1 to math.max(1, passes)).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { exec(name, fn); true } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
