package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the BootstrapDraws adoption gate (VERDICT r14
  * item 5): alternate the fused-expression and sha2-tree variants of
  * q_stats_bootstrap inside ONE JVM at sf0.1, min-of-N each, and
  * print the relative cut. Run: `sbt "Test/runMain graft.BootstrapProbe"`. */
object BootstrapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = Tables.orders(spark, sfDir)
    orders.cache().count() // pin the scan out of the measurement
    def run(native: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.Aggregations.bootstrapMeanImpl(orders,
        col("o_orderkey"), col("o_totalprice"), 100, "bs", native).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both codegen paths once
    run(true); run(false)
    val n = 5
    val times = (1 to n).flatMap { _ =>
      Seq(true -> run(true), false -> run(false))
    }
    val nat = times.collect { case (true, t) => t }
    val tree = times.collect { case (false, t) => t }
    val cut = 1.0 - nat.min / tree.min
    println(f"native  min=${nat.min}%.3f  all=${nat.map(t => f"$t%.3f").mkString(",")}")
    println(f"tree    min=${tree.min}%.3f  all=${tree.map(t => f"$t%.3f").mkString(",")}")
    println(f"cut=${cut * 100}%.1f%%")
    spark.stop()
  }
}
