package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: sweep a query list for HOT LOW-PARALLELISM stages —
  * stages whose task count is far below the session parallelism but
  * whose executor CPU is a large share of the query (the one-split
  * harness-scan pathology guide §2.5 describes; the r17
  * quality-profile find generalized). Prints, per query, the total
  * wall and every stage with tasks <= threshold and cpu >= minMs.
  * Run: `sbt "Test/runMain graft.HotStageSweep q1,q2,... [maxTasks] [minCpuMs]"`. */
object HotStageSweep {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSet).getOrElse(Set.empty[String])
    val maxTasks = if (args.length > 1) args(1).toInt else 4
    val minCpu = if (args.length > 2) args(2).toLong else 300L
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.add((sc.stageInfo.numTasks,
          sc.stageInfo.completionTime.getOrElse(0L) -
            sc.stageInfo.submissionTime.getOrElse(0L),
          sc.stageInfo.taskMetrics.executorCpuTime / 1000000L))
    })
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    qs.foreach { case (_, f) => // warmup
      try f(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    qs.foreach { case (n, f) =>
      Thread.sleep(100); stages.clear()
      val t0 = System.nanoTime()
      try {
        f(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150)
        import scala.jdk.CollectionConverters._
        val hot = stages.asScala.toSeq
          .filter { case (t, _, cpu) => t <= maxTasks && cpu >= minCpu }
          .sortBy(-_._3)
        val hotStr = hot.map { case (t, w, c) => s"${t}t/${w}ms/${c}cpu" }
          .mkString(" ")
        println(f"[hotstage] $n%-28s wall ${wall}%5.2f  ${if (hot.isEmpty) "-" else hotStr}")
      } catch { case e: Throwable =>
        println(s"[hotstage] $n FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
