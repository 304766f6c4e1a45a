package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe for the vocabGrowth fold adoption gate (VERDICT r15
  * item 2 / bench_notes r16_candidate): alternate the folded
  * (first-decile bucket) and expanded (vocab×10 cross-join) variants
  * of q_text_vocab_growth inside ONE JVM at sf0.1, min-of-N each,
  * assert row-identical output, print the relative cut.
  * Run: `sbt "Test/runMain graft.VocabGrowthProbe"`. */
object VocabGrowthProbe {
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
    val docs = Tables.documents(spark, sfDir)
    def run(folded: Boolean): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.TextOps.vocabGrowthImpl(docs, folded)
        .collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // warm both plans once and pin output parity
    val (_, wf) = run(true)
    val (_, we) = run(false)
    require(wf == we, s"fold changed the output!\n$wf\nvs\n$we")
    val n = 5
    val times = (1 to n).flatMap { _ =>
      Seq(true -> run(true)._1, false -> run(false)._1)
    }
    val fold = times.collect { case (true, t) => t }
    val expand = times.collect { case (false, t) => t }
    val cut = 1.0 - fold.min / expand.min
    println(f"folded   min=${fold.min}%.3f  all=${fold.map(t => f"$t%.3f").mkString(",")}")
    println(f"expanded min=${expand.min}%.3f  all=${expand.map(t => f"$t%.3f").mkString(",")}")
    println(f"cut=${cut * 100}%.1f%%")
    spark.stop()
  }
}
