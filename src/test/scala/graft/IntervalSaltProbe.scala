package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for VERDICT r15 item 5: q_join_interval_overlap at
  * the sf1 SWEEP shape (local[8], dense-every-bucket occupancy ~1340 —
  * above the hotBucketOcc=1024 census cut, so the default plan salts
  * EVERY bucket). Alternates salted (default, salt=32) and unsalted
  * (salt=1) inside one JVM, min-of-N, asserts identical row counts.
  * Run: `GRAFT_SF1_DIR=/tmp/graft_sf1 sbt "Test/runMain graft.IntervalSaltProbe"`. */
object IntervalSaltProbe {
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
    val sessions = graft.operators.Windows.sessionize(
      Tables.events(spark, sfDir), 1800L).localCheckpoint()
    def run(salt: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.Joins.intervalOverlapJoin(sessions,
        col("user_id"), col("session_id"),
        col("start_us"), col("end_us"), 3600000000L, salt = salt).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (_, nS) = run(32) // warm
    val (_, nU) = run(1)
    require(nS == nU, s"salted $nS rows != unsalted $nU")
    println(s"pairs=$nS")
    val n = 3
    val times = (1 to n).flatMap(_ => Seq(32 -> run(32)._1, 1 -> run(1)._1))
    val sal = times.collect { case (32, t) => t }
    val uns = times.collect { case (1, t) => t }
    println(f"salted(32)  min=${sal.min}%.2f  all=${sal.map(t => f"$t%.2f").mkString(",")}")
    println(f"unsalted(1) min=${uns.min}%.2f  all=${uns.map(t => f"$t%.2f").mkString(",")}")
    println(f"salted/unsalted=${sal.min / uns.min}%.2f")
    spark.stop()
  }
}
