package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: where does q_embed_pca's wall time go — the d² moments
  * pass or the 12-step checkpointed power iteration? Times the
  * registered query end-to-end (noop sink), then the same plan with
  * iters = 0 (moments + assembly only); the difference is the
  * iteration loop's cost. Run:
  * `sbt "Test/runMain graft.PcaProbe [sfDir]"`. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pcaprobe] $tag: ${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f")
    }
    val emb = Tables.embeddings(spark, sfDir)
    time("full (iters=12)")(operators.Similarity.pcaTopComponent(emb))
    time("moments only (iters=0)")(operators.Similarity.pcaTopComponent(emb, iters = 0))
    time("iters=1")(operators.Similarity.pcaTopComponent(emb, iters = 1))

    // optional: dump the MOMENTS-STAGE plans (the final query plan is
    // truncated at the last localCheckpoint, so the r17 fused-moments
    // change is invisible there) — fused vs the replaced explode tree
    if (args.contains("plans")) {
      import org.apache.spark.sql.functions._
      val dim = 64
      val v = col("embedding").cast("array<double>")
      val q = lit(1e9)
      val tree = emb.select(explode(flatten(transform(v, (xi, i) =>
          transform(slice(v, i + 1, lit(dim) - i), (xj, jj) =>
            struct(i.as("i"), (i + jj).as("j"),
              floor(xi * xj * q + 0.5).as("t")))))).as("e"))
        .groupBy(col("e.i").as("i"), col("e.j").as("j"))
        .agg(sum(col("e.t")).as("pq"))
      val fused = emb.select(org.apache.spark.sql.GraftBridge.column(
          graft.plans.QuantMomentTerms(
            org.apache.spark.sql.GraftBridge.expression(v), 1e9)).as("t"))
        .agg(org.apache.spark.sql.GraftBridge.column(
          graft.plans.LongVecSum(
            org.apache.spark.sql.GraftBridge.expression(col("t")))
            .toAggregateExpression()).as("m"))
      def dump(path: String, df: org.apache.spark.sql.DataFrame, hdr: String): Unit =
        java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
          s"\n-- $hdr --\n" + df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      dump("plans/r17/q_embed_pca_before.txt", tree,
        "moments stage, REPLACED form: d(d+1)/2-key explode + hash aggregate")
      dump("plans/r17/q_embed_pca_after.txt", fused,
        "moments stage, r17 fused form: QuantMomentTerms + LongVecSum (one pass, one array per partition)")
      println("[pcaprobe] moments-stage plans appended")
    }
    spark.stop()
  }
}
