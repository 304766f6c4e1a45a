package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-query Spark JOB and STAGE counts + wall seconds for a
  * named query list — finds orchestration-heavy queries (many tiny
  * jobs = driver round-trips dominate at bench scale, guide §1.2
  * "remove unnecessary passes"). Builds the frame and noop-writes it,
  * counting every job in between (incl. side jobs from head()/
  * localCheckpoint/broadcast builds during plan construction).
  * Run: `sbt "Test/runMain graft.JobCountProbe q1,q2,..."`. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    // warmup pass (codegen, artifacts)
    qs.foreach { case (_, f) =>
      try f(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"[jobcount] ${"query"}%-28s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"sec"}%6s")
    qs.foreach { case (n, f) =>
      Thread.sleep(50) // let listener drain
      val (j0, s0, t0) = (jobs, stages, tasks)
      val w0 = System.nanoTime()
      try {
        f(spark, sfDir).write.format("noop").mode("overwrite").save()
        Thread.sleep(100)
        println(f"[jobcount] $n%-28s ${jobs - j0}%5d ${stages - s0}%6d ${tasks - t0}%6d ${(System.nanoTime() - w0) / 1e9}%6.2f")
      } catch { case e: Throwable =>
        println(s"[jobcount] $n FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
