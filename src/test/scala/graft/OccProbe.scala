package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: bucket-occupancy profile of the interval-overlap
  * fan at a given sfDir (adjudicating VERDICT r15 item 5 — does the
  * sweep shape's census fire at hotBucketOcc=1024?).
  * Run: `sbt "Test/runMain graft.OccProbe"`. */
object OccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sess = graft.operators.Windows.sessionize(
      Tables.events(spark, sfDir), 1800L)
    val fan = sess.select(col("user_id"), col("session_id"),
      col("start_us").as("s"), col("end_us").as("e"))
      .withColumn("bk", explode(sequence(
        expr("s div 3600000000"), expr("e div 3600000000"))))
    val occ = fan.groupBy("bk").count()
    println("SESSIONS=" + sess.count())
    occ.agg(count(lit(1)).as("n_buckets"), max("count").as("max_occ"),
      expr("percentile(count, 0.5)").as("p50"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(expr("count * count")).as("sum_occ2")).show(false)
    spark.stop()
  }
}
