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
}
