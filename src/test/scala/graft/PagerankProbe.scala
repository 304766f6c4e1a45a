package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: q_graph_pagerank at the sf1 sweep shape, isolated —
  * separates the sweep's in-JVM memory pressure from plan cost.
  * Run: `GRAFT_SF1_DIR=/tmp/graft_sf1 sbt "Test/runMain graft.PagerankProbe"`. */
object PagerankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("q_graph_pagerank")
    val t0 = System.nanoTime()
    q(spark, sfDir).collect()
    println(f"first (artifacts+query): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val times = (1 to 3).map { _ =>
      val t = System.nanoTime()
      q(spark, sfDir).collect()
      (System.nanoTime() - t) / 1e9
    }
    println(f"warm times=${times.map(t => f"$t%.1f").mkString(",")} min=${times.min}%.1f")
    spark.stop()
  }
}
