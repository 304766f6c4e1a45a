package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Dev-only probe for VERDICT r15 item 4: per-stage profile of the
  * q_graph_triangles CENSUS at the sf1 sweep shape (local[8],
  * artifacts pre-built exactly like the sweep's pre-pass), printing
  * wall, task-time, and shuffle bytes per stage — the evidence for
  * whether the wedge merge-walk or anything structural dominates.
  * Run: `GRAFT_SF1_DIR=/tmp/graft_sf1 sbt "Test/runMain graft.TriangleProfileProbe"`. */
object TriangleProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("GRAFT_SCALE_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("q_graph_triangles")
    // artifact pre-pass (the sweep's posture): first call builds the
    // memoized und/ori; afterwards the query is census-only
    val t0 = System.nanoTime()
    q(spark, sfDir).collect()
    println(f"first call (artifacts + census): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val stages = mutable.ArrayBuffer[(Int, String, Long, Long, Long, Long, Int)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, si.name.take(60), m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.executorCpuTime / 1000000L, si.numTasks))
      }
    }
    val times = (1 to 3).map { i =>
      if (i == 3) spark.sparkContext.addSparkListener(listener)
      val t = System.nanoTime()
      q(spark, sfDir).collect()
      (System.nanoTime() - t) / 1e9
    }
    Thread.sleep(2000) // let the listener bus drain
    println(f"census-only times=${times.map(t => f"$t%.1f").mkString(",")} min=${times.min}%.1f")
    println("stageId | tasks | runTime ms | cpu ms | shufRead | shufWrite | name")
    stages.sortBy(-_._3).take(12).foreach { case (id, nm, rt, sr, sw, cpu, nt) =>
      println(f"$id%7d | $nt%5d | $rt%10d | $cpu%6d | ${sr / 1048576}%7d MB | ${sw / 1048576}%8d MB | $nm")
    }
    spark.stop()
  }
}
