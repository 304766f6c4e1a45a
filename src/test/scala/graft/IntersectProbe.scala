package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe for VERDICT r16 item 7: A/B of the census
  * merge-walk codegen — the committed branchy walk vs the
  * `branchless` [[graft.plans.SortedIntersectCount]] variant
  * (ternary-to-int compare + static null-probe elision) — at the
  * exact sf1 sweep shape (local[8], artifacts pre-built). Variants
  * alternate inside ONE JVM (the r14/r16 probe discipline: relative
  * questions are immune to host bands that way), min-of-5 each, and
  * every run's n_triangles is asserted identical. Adoption gate:
  * >=20% on the min, else record and keep the default.
  * Run: `GRAFT_SF1_DIR=/tmp/graft_sf1 sbt "Test/runMain graft.IntersectProbe"`. */
object IntersectProbe {
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
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(sfDir, "lineitem.parquet"))) {
      println(s"building sf1 fixture at $sfDir ...")
      Sf1Fixture.build(spark, "/root/testdata/sf0.1", sfDir)
    }
    val q = SparkEntry.queries("q_graph_triangles")
    // artifact pre-pass + codegen warmup for BOTH variants
    val t0 = System.nanoTime()
    graft.operators.Graph.intersectBranchless = false
    val warmA = q(spark, sfDir).collect()
    println(f"first call (artifacts + census): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    graft.operators.Graph.intersectBranchless = true
    val warmB = q(spark, sfDir).collect()
    require(warmA.toSeq.map(_.toString) == warmB.toSeq.map(_.toString),
      s"variant outputs differ: ${warmA.toSeq} vs ${warmB.toSeq}")
    val times = Map(false -> scala.collection.mutable.ArrayBuffer.empty[Double],
      true -> scala.collection.mutable.ArrayBuffer.empty[Double])
    var expected: String = warmA.toSeq.map(_.toString).mkString("|")
    (1 to 10).foreach { k =>
      val variant = k % 2 == 0 // alternate A,B,A,B...
      graft.operators.Graph.intersectBranchless = variant
      val t = System.nanoTime()
      val rows = q(spark, sfDir).collect()
      val sec = (System.nanoTime() - t) / 1e9
      require(rows.toSeq.map(_.toString).mkString("|") == expected,
        s"variant=$variant produced different rows on pass $k")
      times(variant) += sec
    }
    val a = times(false).min
    val b = times(true).min
    println(f"branchy   passes=${times(false).map(t => f"$t%.2f").mkString(",")} min=$a%.2f s")
    println(f"branchless passes=${times(true).map(t => f"$t%.2f").mkString(",")} min=$b%.2f s")
    println(f"delta: ${(1 - b / a) * 100}%.1f%% (adoption gate: >=20%%)")
    spark.stop()
  }
}
