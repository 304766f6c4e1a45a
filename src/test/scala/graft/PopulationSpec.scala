package graft

import org.apache.spark.sql.functions._
import graft.operators.Population

/** Population composite semantics: the numeric gate, the drop-on-miss
  * inner join, and the enriched feature properties
  * (population_pipeline.py:38-75).
  */
class PopulationSpec extends SparkTestBase {

  test("gate drops non-numeric values; join drops unknown countries") {
    val res = Population.populationPipeline(spark, sf).collect()
    val names = res.map(_.getString(0)).toSet
    assert(!names.contains("ATLANTIS"), "non-numeric 2024 value must be gated out")
    assert(!names.contains("ARRAKIS"))
    assert(!names.contains("NUMENOR"), "country absent from countries must be join-dropped")
    val expected = Tables.nation(spark, sf).select("n_name")
      .collect().map(_.getString(0)).toSet
    assert(names == expected)
  }

  test("zip-fed composite equals the CSV-fed composite (the reference's real entry)") {
    import graft.sources.Zip
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // pack the wide CSV fixture into a zip — population_pipeline.py's
    // actual ingest shape (download zip → unzip → read CSV); the HTTP
    // half is a driver utility, the archive half is this engine path
    val csvDir = Population.wideCsvFixture(spark, sf)
    val zipDir = graft.sources.IO.tmp("graft_popzip_")
    val zos = new ZipOutputStream(new java.io.FileOutputStream(
      new java.io.File(zipDir, "population.zip")))
    new java.io.File(csvDir).listFiles.filter(_.getName.endsWith(".csv")).foreach { f =>
      zos.putNextEntry(new ZipEntry(f.getName))
      java.nio.file.Files.copy(f.toPath, zos)
      zos.closeEntry()
    }
    zos.close()
    val wideSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("Country Name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("2023", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("2024", org.apache.spark.sql.types.StringType)))
    val viaZip = Population.populationPipeline(spark, sf,
      wideIn = Some(Zip.readZippedCsv(spark, zipDir + "/*.zip", wideSchema)))
    val direct = Population.populationPipeline(spark, sf)
    assert(viaZip.exceptAll(direct).isEmpty && direct.exceptAll(viaZip).isEmpty)
  }

  test("population values and enriched feature properties are correct") {
    val df = Population.populationPipeline(spark, sf)
    val joined = df.join(Tables.nation(spark, sf),
      df("country") === col("n_name"))
    val wrong = joined.filter(
      col("population") =!= (col("n_nationkey") + 1) * 1250 + 3).count()
    assert(wrong == 0)
    // properties carry {name, population, year}
    val r = df.filter(col("country") === "NATION_7").head
    val props = r.getString(3)
    assert(props.contains("\"name\":\"NATION_7\"") &&
      props.contains(s""""population":${r.getLong(1)}""") &&
      props.contains("\"year\":2024"))
  }
}
