package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.External

/** External-process boundary: per-partition pipe semantics and the
  * config sink golden shape.
  */
class ExternalSpec extends SparkTestBase {

  test("pipePartitions through cat is the identity on serialized rows") {
    val df = Tables.region(spark, sf).select(col("r_regionkey"), col("r_name"))
    val direct = df.select(to_json(struct(col("*"))).as("line"))
      .collect().map(_.getString(0)).sorted
    val piped = External.pipePartitions(df, Seq("cat"))
      .collect().map(_.getString(0)).sorted
    assert(piped.toSeq == direct.toSeq)
  }

  test("pipePartitions runs one process per partition (wc -l sums to row count)") {
    val df = Tables.nation(spark, sf).repartition(4)
    val counts = External.pipePartitions(df, Seq("wc", "-l"))
      .collect().map(_.getString(0).trim.toLong)
    assert(counts.length == 4)
    assert(counts.sum == df.count())
  }

  test("writeTileConfig emits the compact config shape") {
    val out = Files.createTempDirectory("graft_cfg_").resolve("config.json")
    External.writeTileConfig(Seq("precip_01_2024", "precip_02_2024"), "/tiles", out.toString)
    val json = Files.readString(out)
    assert(json ==
      """{"styles":{},"data":{"precip_01_2024":{"pbf":"/tiles/precip_01_2024"},""" +
        """"precip_02_2024":{"pbf":"/tiles/precip_02_2024"}}}""")
  }

  test("writeHtmlViewer: self-contained page wiring server, template, years") {
    val out = Files.createTempDirectory("graft_viewer_").resolve("viewer.html")
    External.writeHtmlViewer(out.toString, "Precipitation Viewer",
      "http://localhost:8080", "precipitation_{month}_{year}_land",
      years = Seq(2022, 2023, 2024), legendLabel = "mm/day",
      legendStops = Seq("0", "5", "15", "25", "40+"))
    val html = Files.readString(out)
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("<title>Precipitation Viewer</title>"))
    // the JS wiring: server URL and layer template as string literals,
    // the tile path shape, and the period selectors
    assert(html.contains("""var SERVER="http://localhost:8080";"""))
    assert(html.contains("""var TEMPLATE="precipitation_{month}_{year}_land";"""))
    assert(html.contains("""/data/"""))
    assert(html.contains("""{z}/{x}/{y}""") || html.contains("/0/0/0.png"))
    assert(html.contains("""<option value="2024" selected>"""))
    assert(html.contains("""<option value="06">"""))
    assert(html.contains("mm/day") && html.contains("<span>40+</span>"))
  }

  test("writeHtmlViewer: hostile inputs are escaped, not interpolated") {
    val out = Files.createTempDirectory("graft_viewer_").resolve("evil.html")
    External.writeHtmlViewer(out.toString,
      """<script>alert("t")</script>""",
      """http://x/"; fetch("http://evil")//""",
      "layer_{year}\"</script><script>", years = Seq(2024))
    val html = Files.readString(out)
    // no raw <script> payload from the title, no quote breakout from
    // the URL or template literals, and </script> inside a JS literal
    // is defused to </script so it cannot close the real tag
    assert(!html.contains("""<script>alert"""))
    assert(!html.contains("""fetch("http://evil")"""))
    assert(html.contains("&lt;script&gt;"))
    assert(html.contains("\\u003c/script"))
    assert(html.contains("""\"; fetch(\""""))
  }
}
