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

  test("malformed CSV: PERMISSIVE quarantines exactly the planted rows, whole") {
    import graft.sources.IO
    val out = IO.malformedNationCsv(spark, sf)
    val rows = spark.read.option("header", true).option("mode", "PERMISSIVE")
      .schema(IO.NationSchema.add(IO.CorruptCol, org.apache.spark.sql.types.StringType))
      .csv(out).collect()
    val (bad, clean) = rows.partition(r => r.getAs[String](IO.CorruptCol) != null)
    assert(clean.length.toLong == Tables.nation(spark, sf).count())
    // both planted rows captured VERBATIM (the quarantine keeps the
    // original text for repair, the reference's row-guard posture)
    assert(bad.map(_.getAs[String](IO.CorruptCol)).sorted.toSeq ==
      Seq("88,TRUNCATED,notanint", "notanint,BADLAND,0"))
    // the typed columns of a corrupt row are null where the parse failed
    assert(bad.forall(r => r.isNullAt(0) || r.isNullAt(2)))
  }

  test("malformed CSV: DROPMALFORMED yields exactly the clean subset") {
    import graft.sources.IO
    val out = IO.malformedNationCsv(spark, sf)
    // collect(), not count(): the zero-column count fast path skips
    // row parsing entirely, so the drop policy never runs there
    val dropped = spark.read.option("header", true).option("mode", "DROPMALFORMED")
      .schema(IO.NationSchema).csv(out).collect()
    assert(dropped.length.toLong == Tables.nation(spark, sf).count())
    assert(dropped.forall(r => !r.isNullAt(0) && !r.isNullAt(2)))
  }

  test("malformed CSV: FAILFAST aborts the scan") {
    import graft.sources.IO
    val out = IO.malformedNationCsv(spark, sf)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.option("header", true).option("mode", "FAILFAST")
        .schema(IO.NationSchema).csv(out).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed"), e.getMessage.take(500))
  }

  test("staged malformed split: one parse, source never re-read, same rows as the cache path") {
    import graft.sources.IO
    import org.apache.spark.sql.types.StringType
    // a PRIVATE copy of the dirty fixture — it gets deleted below, so
    // it must not be the memoized directory other tests share
    val src = Files.createTempDirectory("graft_staged_src_").toString
    Tables.nation(spark, sf).write.mode("overwrite").option("header", true).csv(src)
    Files.writeString(java.nio.file.Paths.get(src, "part-zz-malformed.csv"),
      "n_nationkey,n_name,n_regionkey\n" +
        "notanint,BADLAND,0\n" +
        "88,TRUNCATED,notanint\n")
    val parsed = spark.read.option("header", true).option("mode", "PERMISSIVE")
      .schema(IO.NationSchema.add(IO.CorruptCol, StringType)).csv(src)
    val staging = IO.tmp("graft_staged_")
    val (clean, quarantine) = IO.stagedMalformedSplit(spark, parsed, staging)
    // ONE parse, by construction: delete the SOURCE files — if either
    // split lazily re-read them, the collects below would fail or
    // return nothing
    IO.rmTree(src)
    val cleanRows = clean.orderBy(col("n_nationkey")).collect()
    val cachedRows = graft.SparkEntry.queries("q_scan_csv_malformed")(spark, sf).collect()
    assert(cleanRows.map(_.toSeq).toSeq == cachedRows.map(_.toSeq).toSeq,
      "staged clean split must equal the cache-path query row for row")
    val bad = quarantine.collect()
    assert(bad.length == 2)
    assert(bad.map(_.getAs[String](IO.CorruptCol)).sorted.toSeq ==
      Seq("88,TRUNCATED,notanint", "notanint,BADLAND,0"))
  }

  test("zip ingest: expanded CSV entries equal the source table, junk entries skipped") {
    import graft.sources.{IO, Zip}
    val dir = IO.zippedNationDir(spark, sf)
    // ≥2 archives: the scan's parallelism unit (zip is not splittable)
    val archives = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".zip"))
    assert(archives.length >= 2, s"want ≥2 archives, got ${archives.length}")
    val got = Zip.readZippedCsv(spark, dir + "/*.zip", IO.NationSchema)
    val want = Tables.nation(spark, sf)
    assert(got.count() == want.count())
    // exact set equality both directions — the README.txt junk member
    // must contribute nothing, the CSV members everything
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the expansion parallelizes: one input partition per archive
    assert(Zip.zipCsvLines(spark, dir + "/*.zip").rdd.getNumPartitions >= 1)
  }

  test("zip ingest: per-entry header dropped, header=false keeps every line") {
    import graft.sources.{IO, Zip}
    val dir = IO.zippedNationDir(spark, sf)
    val n = Tables.nation(spark, sf).count()
    val withHeaders = Zip.zipCsvLines(spark, dir + "/*.zip", header = false).count()
    val without = Zip.zipCsvLines(spark, dir + "/*.zip").count()
    // each of the 2 CSV entries carries exactly one header line
    assert(without == n && withHeaders == n + 2,
      s"n=$n withHeaders=$withHeaders without=$without")
  }

  test("malformed JSON: the three policies agree with the CSV contract") {
    import graft.sources.IO
    import org.apache.spark.sql.types._
    val out = IO.malformedRegionJson(spark, sf)
    val withCorrupt = StructType(IO.RegionSchema.fields :+
      StructField(IO.CorruptCol, StringType))
    val nClean = Tables.region(spark, sf).count()
    val rows = spark.read.option("mode", "PERMISSIVE")
      .schema(withCorrupt).json(out).collect()
    val (bad, clean) = rows.partition(r => r.getAs[String](IO.CorruptCol) != null)
    assert(clean.length.toLong == nClean && bad.length == 2)
    assert(spark.read.option("mode", "DROPMALFORMED")
      .schema(IO.RegionSchema).json(out).count() == nClean)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.option("mode", "FAILFAST")
        .schema(IO.RegionSchema).json(out).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed"), e.getMessage.take(500))
  }
}
