package graft.operators

import org.apache.spark.sql.SparkSession
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Multi-pipeline orchestration — the engine analog of the reference's
  * `run_all_pipelines` driver (utils/pipeline_manager.py:224-257):
  * run every registered pipeline, tally per-pipeline success, CONTINUE
  * past failures (a failed data type never aborts the rest), report
  * `success_count/total` and the failed names, overall success iff all
  * succeeded.
  *
  * Where the reference loops sequentially over OS processes, the engine
  * runs the pipelines as CONCURRENT job groups on ONE SparkSession:
  * Spark's scheduler interleaves their stages across the cluster, so a
  * pipeline blocked on a long shuffle doesn't idle the executors the
  * way the reference's sequential loop idles its machine. Failure
  * isolation is per-pipeline: each body runs under its own job group
  * (job-group properties are thread-local) and its exception is caught
  * and recorded, never propagated to siblings.
  *
  * Scale posture: N pipelines on one session share broadcast variables
  * and file-listing caches of common inputs; driver threads are the
  * only per-pipeline overhead. For strict latency isolation a real
  * deployment adds FAIR scheduler pools (one per job group) — the
  * mechanism is orthogonal to this orchestration contract.
  */
object PipelineManager {

  /** One pipeline's outcome (the reference's per-type success/failed
    * bookkeeping, pipeline_manager.py:234-249). */
  final case class PipelineResult(name: String, ok: Boolean, error: Option[String])

  /** The run summary (pipeline_manager.py:251-257). */
  final case class RunSummary(results: Seq[PipelineResult]) {
    def successCount: Int = results.count(_.ok)
    def failedNames: Seq[String] = results.filterNot(_.ok).map(_.name)
    /** `success_count == len(data_types)` (pipeline_manager.py:257). */
    def allSucceeded: Boolean = successCount == results.size
  }

  /** Run `pipelines` concurrently on `s`, at most `parallelism` at a
    * time; always returns one result per pipeline, in input order.
    *
    * `timeout` is the whole run's deadline (the engine analog of the
    * reference's PIPELINE_TIMEOUT=7200 budget, pipeline_config.py:51,
    * and the per-subprocess `timeout=1800`,
    * temperature_pipeline.py:147): a pipeline still running at the
    * deadline has its job group cancelled (running Spark tasks
    * interrupted) and is tallied as a `timeout` failure — a hung
    * pipeline can delay the summary, never block it forever. */
  def runAll(s: SparkSession, pipelines: Seq[(String, () => Unit)],
      parallelism: Int = 3, timeout: Duration = Duration.Inf): RunSummary = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val futs = pipelines.map { case (name, body) =>
        Future {
          // own job group: cancellation/diagnosis scoped to this pipeline
          s.sparkContext.setJobGroup(s"graft-pipeline-$name",
            s"graft pipeline: $name", interruptOnCancel = true)
          // own scheduler pool: a no-op under default FIFO, but when the
          // session runs the FAIR scheduler each pipeline gets latency
          // isolation without any change here
          s.sparkContext.setLocalProperty("spark.scheduler.pool", s"graft-$name")
          try { body(); PipelineResult(name, ok = true, None) }
          catch { case e: Throwable =>
            PipelineResult(name, ok = false,
              Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")) }
          finally {
            s.sparkContext.setLocalProperty("spark.scheduler.pool", null)
            s.sparkContext.clearJobGroup()
          }
        }
      }
      val deadline = if (timeout.isFinite) Some(System.nanoTime + timeout.toNanos) else None
      val results = pipelines.zip(futs).map { case ((name, _), f) =>
        val remaining = deadline
          .map(d => Duration.fromNanos(math.max(0L, d - System.nanoTime)))
          .getOrElse(Duration.Inf)
        try Await.result(f, remaining)
        catch { case _: java.util.concurrent.TimeoutException =>
          s.sparkContext.cancelJobGroup(s"graft-pipeline-$name")
          PipelineResult(name, ok = false, Some("timeout"))
        }
      }
      RunSummary(results)
    } finally { pool.shutdownNow(); () }
  }

  /** The reference's default data-type set, end-to-end: precipitation,
    * temperature, humidity (pipeline_manager.py's `data_types` loop),
    * each writing under its own subdirectory of `outRoot`. */
  def runClimatePipelines(s: SparkSession, dir: String, outRoot: String): RunSummary =
    runAll(s, Seq(
      "precipitation" -> (() =>
        Climate.climatePipeline(s, dir, s"$outRoot/precipitation")),
      "temperature" -> (() =>
        Climate.temperatureComposite(s, dir)
          .write.mode("overwrite").parquet(s"$outRoot/temperature")),
      "humidity" -> (() =>
        Climate.humidityComposite(s, dir)
          .write.mode("overwrite").parquet(s"$outRoot/humidity"))))
}
