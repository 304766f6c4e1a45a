package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Planted-skew evidence for the salted join: a deterministic hot-key
  * fixture shows the mitigation actually flattens per-task load, and
  * AQE's own skew handling interacts sanely with both forms.
  *
  * Task cost is measured as post-shuffle rows per task
  * (spark_partition_id over the join output) — the deterministic proxy
  * for task time: an SMJ task's runtime is linear in its input rows,
  * and row counts don't wobble with machine load the way wall-clock
  * task times do.
  */
class JoinSkewSpec extends SparkTestBase {

  // 200k probe rows, 50% on one hot key, the rest uniform over 10k keys
  private def hotBig: DataFrame =
    spark.range(0, 200000).select(
      when(col("id") % 2 === 0, lit(7L))
        .otherwise(pmod(col("id"), lit(10000L))).as("k"),
      col("id").as("row_id"))

  private def dims: DataFrame =
    spark.range(0, 10000).select(col("id").as("k2"), (col("id") * 3).as("payload"))

  private def taskRows(df: DataFrame): Seq[Long] =
    df.select(spark_partition_id().as("pid"))
      .groupBy("pid").count().collect().map(_.getLong(1)).toSeq

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salting flattens the hot key: measured task-skew ratio collapses") {
    // AQE off + 32 partitions: raw shuffle distribution, no coalescing
    // or runtime skew-splitting masking the mechanism under test
    withConfs("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "32") {
      val unsalted = hotBig.hint("merge").join(dims, col("k") === col("k2"))
      val salted = Joins.saltedJoin(hotBig, "k", Seq("row_id"), dims, "k2")
      // identical join semantics first
      val n = unsalted.count()
      assert(salted.count() == n)
      val u = taskRows(unsalted)
      val s = taskRows(salted)
      val (maxU, maxS) = (u.max, s.max)
      // unsalted: the hot key's ~100k rows land in ONE task (>=50% of
      // all rows); salted: spread over SaltCount partitions
      assert(maxU >= n / 2, s"expected hot task >= ${n / 2}, got $maxU")
      assert(maxU >= 3 * maxS,
        s"salting should cut the max task by >=3x: unsalted max=$maxU, salted max=$maxS")
      // skew ratio (max/mean) collapses toward even
      val ratioU = maxU.toDouble / (u.sum.toDouble / u.size)
      val ratioS = maxS.toDouble / (s.sum.toDouble / s.size)
      info(f"task-skew ratio (max/mean): unsalted $ratioU%.1f -> salted $ratioS%.1f")
      assert(ratioS < ratioU / 2)
    }
  }

  test("AQE skew-join splits the unsalted hot partition; salted join unaffected") {
    withConfs(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
        "spark.sql.shuffle.partitions" -> "32") {
      val unsalted = hotBig.hint("merge").join(dims, col("k") === col("k2"))
      // collect() executes THIS dataset's queryExecution (count() or a
      // noop write would plan a separate copy), driving its adaptive
      // plan to final so the runtime skew-split marker is visible
      val n = unsalted.collect().length.toLong
      val plan = unsalted.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not split the planted skew:\n${plan.take(1500)}")
      // manual salting under AQE: same rows, and its pre-flattened
      // distribution needs no runtime split — the two mitigations compose
      val salted = Joins.saltedJoin(hotBig, "k", Seq("row_id"), dims, "k2")
      assert(salted.count() == n)
    }
  }
}
