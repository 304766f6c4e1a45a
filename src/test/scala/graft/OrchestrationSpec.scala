package graft

import java.nio.file.Files
import graft.operators.PipelineManager

/** Multi-pipeline orchestration semantics
  * (utils/pipeline_manager.py:224-257): concurrent execution on one
  * session, per-pipeline success tally, continue-on-failure.
  */
class OrchestrationSpec extends SparkTestBase {

  test("runClimatePipelines: all three composites land concurrently on one session") {
    val out = Files.createTempDirectory("graft_orch").toString
    val summary = PipelineManager.runClimatePipelines(spark, sf, out)
    assert(summary.allSucceeded && summary.successCount == 3, summary)
    Seq("precipitation", "temperature", "humidity").foreach { p =>
      val n = spark.read.parquet(s"$out/$p").count()
      assert(n > 0, s"$p wrote no rows")
    }
    // humidity output carries its validation columns end-to-end
    val hum = spark.read.parquet(s"$out/humidity")
    assert(hum.columns.sorted.toSeq ==
      Seq("collection", "month", "n_features", "valid", "year"))
  }

  test("a hung pipeline is cancelled at the deadline; siblings still complete") {
    import scala.concurrent.duration._
    val out = java.nio.file.Files.createTempDirectory("graft_orch_hang").toString
    val summary = PipelineManager.runAll(spark, Seq(
      "fast" -> (() =>
        Tables.nation(spark, sf).write.mode("overwrite").parquet(s"$out/fast")),
      "hung" -> (() => Thread.sleep(120000))),
      timeout = 15.seconds)
    assert(summary.successCount == 1 && summary.failedNames == Seq("hung"), summary)
    assert(summary.results.find(_.name == "hung").get.error.contains("timeout"))
    assert(spark.read.parquet(s"$out/fast").count() > 0)
  }

  test("an injected failure is tallied and does NOT stop sibling pipelines") {
    val out = Files.createTempDirectory("graft_orch_fail").toString
    val summary = PipelineManager.runAll(spark, Seq(
      "ok_a" -> (() =>
        Tables.nation(spark, sf).write.mode("overwrite").parquet(s"$out/a")),
      "boom" -> (() => throw new IllegalStateException("injected failure")),
      "ok_b" -> (() =>
        Tables.region(spark, sf).write.mode("overwrite").parquet(s"$out/b"))))
    // continue-on-failure: both siblings completed and their outputs landed
    assert(summary.successCount == 2 && !summary.allSucceeded)
    assert(summary.failedNames == Seq("boom"))
    assert(summary.results.map(_.name) == Seq("ok_a", "boom", "ok_b"))
    assert(summary.results.find(_.name == "boom").get.error.get.contains("injected failure"))
    assert(spark.read.parquet(s"$out/a").count() > 0)
    assert(spark.read.parquet(s"$out/b").count() > 0)
  }
}
