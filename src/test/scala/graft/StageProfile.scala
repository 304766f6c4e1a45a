package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-stage profiler for ONE registered query:
  * `Test/runMain graft.StageProfile <query> <sfDir> [cpus]` — prints
  * every completed stage's task count, wall, executor-cpu, shuffle
  * read/write, and the head of its name, ordered by wall. Dev tool
  * for the sweep's slow tail; not part of the shipped library.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "24"
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft-stage-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(q)
    // warmup (codegen + artifact builds land here, as in Bench)
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Int, Long, Long, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val tm = si.taskMetrics
        stages.add((si.stageId, si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          tm.executorCpuTime / 1000000L,
          tm.shuffleReadMetrics.totalBytesRead,
          tm.shuffleWriteMetrics.bytesWritten,
          si.name.takeWhile(_ != '\n').take(70)))
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // listener-bus drain
    import scala.jdk.CollectionConverters._
    println(f"TOTAL $q wall ${wall}%.1f s")
    println(f"${"stage"}%6s ${"tasks"}%6s ${"wall_ms"}%8s ${"cpu_ms"}%9s ${"shRd_MB"}%8s ${"shWr_MB"}%8s  name")
    stages.asScala.toSeq.sortBy(-_._3).foreach {
      case (id, nt, w, cpu, rd, wr, name) =>
        println(f"$id%6d $nt%6d $w%8d $cpu%9d ${rd / 1048576.0}%8.1f ${wr / 1048576.0}%8.1f  $name")
    }
    spark.stop()
  }
}
