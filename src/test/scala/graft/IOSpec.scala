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
    val queryRows = graft.SparkEntry.queries("q_scan_csv_malformed")(spark, sf).collect()
    assert(cleanRows.map(_.toSeq).toSeq == queryRows.map(_.toSeq).toSeq,
      "staged clean split must equal the registered query row for row")

    // the REGISTERED queries route through the staged split: their
    // plans scan the parquet STAGING table — no raw csv/json scan, no
    // process-lifetime cache — so the one-parse proof above covers the
    // query path itself
    Seq("q_scan_csv_malformed" -> "csv", "q_scan_json_malformed" -> "json")
      .foreach { case (q, raw) =>
        val plan = graft.SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.toString()
        assert(plan.toLowerCase.contains("parquet"), s"$q must scan staging parquet")
        assert(!plan.toLowerCase.contains(s"filescan $raw"), s"$q re-reads the raw $raw source")
        assert(!plan.contains("InMemoryTableScan"), s"$q still cache-shaped")
      }
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

  test("zip ingest: ONE multi-entry archive fans out per entry, lines identical") {
    import graft.sources.{IO, Zip}
    // the reference's real source is a single zip (population_pipeline
    // .py:16) — per-ARCHIVE parallelism would make it one task. Build
    // one archive with 3 CSV entries + junk; the central-directory
    // path must plan one task per entry.
    val dir = IO.tmp("graft_zip_entries_")
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/one.zip"))
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    entry("a.csv", "k,v\n1,aa\n2,bb\n")
    entry("README.txt", "not a csv\n")
    entry("b.csv", "k,v\n3,cc\n")
    entry("c.csv", "k,v\n4,dd\n5,ee\n6,ff\n")
    zip.close()

    val byEntry = Zip.zipCsvLinesByEntry(spark, s"$dir/*.zip")
    assert(byEntry.rdd.getNumPartitions == 3,
      s"one task per CSV entry: got ${byEntry.rdd.getNumPartitions}")
    val byArchive = Zip.zipCsvLines(spark, s"$dir/*.zip")
    assert(byEntry.collect().sorted.toSeq == byArchive.collect().sorted.toSeq)
    // the schema'd reader routes local paths through the per-entry path
    val df = Zip.readZippedCsv(spark, s"$dir/*.zip",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    assert(df.rdd.getNumPartitions == 3 && df.count() == 6)
  }

  test("zip ingest: a quoted field spanning lines fails LOUDLY, both paths") {
    import graft.sources.{IO, Zip}
    val dir = IO.tmp("graft_zip_multiline_")
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/bad.zip"))
    zip.putNextEntry(new java.util.zip.ZipEntry("m.csv"))
    zip.write("k,v\n1,\"line one\nline two\"\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    zip.closeEntry()
    zip.close()
    Seq(
      () => Zip.zipCsvLinesByEntry(spark, s"$dir/*.zip").collect(),
      () => Zip.zipCsvLines(spark, s"$dir/*.zip").collect()
    ).foreach { run =>
      val e = intercept[org.apache.spark.SparkException](run())
      def quoteMsg(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("open quoted field"))
          || quoteMsg(t.getCause))
      assert(quoteMsg(e), s"expected the open-quoted-field error, got: $e")
    }
  }

  test("zip ingest: an unterminated quoted HEADER fails loudly, both paths") {
    import graft.sources.{IO, Zip}
    // the header is guarded BEFORE the drop on both paths — a header
    // ending inside an open quoted field would otherwise silently
    // leak its continuation line as the first data row
    val dir = IO.tmp("graft_zip_badheader_")
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/h.zip"))
    zip.putNextEntry(new java.util.zip.ZipEntry("h.csv"))
    zip.write("k,\"v\n1,x\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    zip.closeEntry()
    zip.close()
    Seq(
      () => Zip.zipCsvLinesByEntry(spark, s"$dir/*.zip").collect(),
      () => Zip.zipCsvLines(spark, s"$dir/*.zip").collect()
    ).foreach { run =>
      val e = intercept[org.apache.spark.SparkException](run())
      def quoteMsg(t: Throwable): Boolean =
        t != null && (Option(t.getMessage).exists(_.contains("open quoted field"))
          || quoteMsg(t.getCause))
      assert(quoteMsg(e), s"expected the open-quoted-field error on the header, got: $e")
    }
  }

  test("zip ingest: a stray literal quote is DATA, not a multiline hazard") {
    import graft.sources.{IO, Zip}
    // `2,Pipe 3/4"` — a quote not at field start is a literal character
    // to the CSV parser; the guard must pass it (the naive odd-count
    // check rejected it). Quoted fields with escaped "" also pass.
    val dir = IO.tmp("graft_zip_strayq_")
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/q.zip"))
    zip.putNextEntry(new java.util.zip.ZipEntry("q.csv"))
    zip.write("k,v\n1,Pipe 3/4\"\n2,\"say \"\"hi\"\"\"\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    zip.closeEntry()
    zip.close()
    val got = Zip.zipCsvLinesByEntry(spark, s"$dir/*.zip").collect().sorted
    assert(got.toSeq == Seq("1,Pipe 3/4\"", "2,\"say \"\"hi\"\"\""), got.mkString("|"))
    assert(Zip.zipCsvLines(spark, s"$dir/*.zip").collect().sorted.toSeq == got.toSeq)
  }

  test("zip ingest: duplicate entry names fall back to the sequential cursor") {
    import graft.sources.{IO, Zip}
    // legal zip: two entries named data.csv (append-updated archive).
    // ZipFile addresses by NAME, so the per-entry path would read the
    // first twice and lose the second — it must refuse, and
    // readZippedCsv must fall back to the cursor path, which streams
    // both correctly.
    val dir = IO.tmp("graft_zip_dup_")
    // ZipOutputStream refuses to WRITE duplicates, so build with two
    // equal-length names and byte-patch the second to the first — name
    // bytes appear verbatim in the local header and central directory
    // and are not covered by any checksum, so the result is a valid
    // archive with two entries both named data1.csv
    val zip = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/dup.zip"))
    Seq("data1.csv" -> "k,v\n1,old\n", "data2.csv" -> "k,v\n2,new\n").foreach {
      case (name, body) =>
        zip.putNextEntry(new java.util.zip.ZipEntry(name))
        zip.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zip.closeEntry()
    }
    zip.close()
    val p = java.nio.file.Paths.get(s"$dir/dup.zip")
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    java.nio.file.Files.write(p, new String(java.nio.file.Files.readAllBytes(p), iso)
      .replace("data2.csv", "data1.csv").getBytes(iso))
    intercept[IllegalArgumentException] {
      Zip.zipCsvLinesByEntry(spark, s"$dir/*.zip")
    }
    val df = Zip.readZippedCsv(spark, s"$dir/*.zip",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      == Seq((1L, "old"), (2L, "new")))
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

  test("xml round trip: markup-hostile strings, nulls, and doubles survive exactly") {
    import spark.implicits._
    // every XML-breaking shape in one table: angle brackets, ampersand,
    // CDATA-ish content, quotes, non-ASCII, newline, NULL, and doubles
    // whose shortest decimal repr must re-parse to the same bits
    val rows = Seq(
      (1L, "<b>bold</b> & \"quoted\"", 0.1),
      (2L, "]]> <![CDATA[x]]> '", -1.5e-300),
      (3L, "naïve — ünïcode ✓", 9007199254740993.0),
      (4L, null.asInstanceOf[String], 185.22),
      (5L, "line\nbreak\ttab", 0.0))
      .toDF("id", "s", "v")
    val out = Files.createTempDirectory("graft_xmlspec_").toString
    rows.write.mode("overwrite").option("rowTag", "row").format("xml").save(out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val back = spark.read.option("rowTag", "row").schema(schema)
      .format("xml").load(out)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getDouble(2)))
    val want = rows.orderBy(col("id")).collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1), r.getDouble(2)))
    assert(back.toSeq == want.toSeq, s"got ${back.toSeq}")
  }
}
