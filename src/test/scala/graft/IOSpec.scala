package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Climate

/** Layout-level assertions for the file sinks (the oracle already
  * verifies round-trip VALUES; these pin the on-disk contract).
  */
class IOSpec extends SparkTestBase {

  test("partitioned sink: hive year=/month= directories, one per month") {
    val out = Files.createTempDirectory("graft_layout_").toString
    val df = Climate.withYearMonth(Tables.orders(spark, sf), "o_orderdate")
    df.write.partitionBy("year", "month").mode("overwrite").parquet(out)
    val years = new java.io.File(out).listFiles.filter(_.isDirectory)
    assert(years.nonEmpty && years.forall(_.getName.matches("year=\\d{4}")))
    val monthDirs = years.flatMap(_.listFiles.filter(_.isDirectory))
    assert(monthDirs.forall(_.getName.matches("month=\\d{1,2}")))
    val expected = df.select(col("year"), col("month")).distinct().count()
    assert(monthDirs.length.toLong == expected,
      s"one directory per (year,month): got ${monthDirs.length}, want $expected")
  }

  test("partition-col repartition before partitionBy: exactly ONE file per partition") {
    val out = Files.createTempDirectory("graft_onefile_").toString
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    Climate.withYearMonth(Tables.orders(spark, sf), "o_orderdate")
      .repartition(n, col("year"), col("month"))
      .write.partitionBy("year", "month").mode("overwrite").parquet(out)
    val monthDirs = new java.io.File(out).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles.filter(_.isDirectory))
    assert(monthDirs.nonEmpty)
    // each (year,month) hashes to one task -> one data file per dir
    // (the anti-small-files property q_sink_partitioned relies on)
    monthDirs.foreach { d =>
      val files = d.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
  }

  test("csv sink writes a header line") {
    val out = Files.createTempDirectory("graft_hdr_").toString
    Tables.nation(spark, sf).coalesce(1).write.mode("overwrite")
      .option("header", true).csv(out)
    val part = new java.io.File(out).listFiles
      .find(_.getName.endsWith(".csv")).get
    val first = scala.io.Source.fromFile(part).getLines().next()
    assert(first == "n_nationkey,n_name,n_regionkey")
  }

  test("compact json sink: one minified object per line") {
    val out = Files.createTempDirectory("graft_cjson_").toString
    Tables.region(spark, sf)
      .select(to_json(struct(col("r_regionkey"), col("r_name"))).as("value"))
      .coalesce(1).write.mode("overwrite").text(out)
    val part = new java.io.File(out).listFiles
      .find(_.getName.endsWith(".txt")).get
    val lines = scala.io.Source.fromFile(part).getLines().toSeq
    assert(lines.nonEmpty)
    // compact separators: no ", " or ": " anywhere (json.dump
    // separators=(',',':') contract, humidity_pipeline.py:170-172)
    assert(lines.forall(l => l.startsWith("{\"r_regionkey\":") && !l.contains(", ") &&
      !l.contains(": ")))
  }
}
