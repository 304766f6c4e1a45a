package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External-process boundary (SURVEY §2.1 external-process sink +
  * config sink; reference: tippecanoe/mb-util subprocess calls
  * precipitation_pipeline.py:241-268 and the tileserver config write
  * :315-347). Kept OUTSIDE the relational core per SURVEY §2.11.4 —
  * tile generation is presentation, not query semantics — but the
  * engine provides the scalable plumbing:
  *
  *  - [[pipePartitions]] streams each partition's rows through an
  *    external command (RDD `pipe` — one process per partition,
  *    stdin/stdout line protocol). This is how a tippecanoe-style
  *    binary would consume GeoJSON features at scale: processes run
  *    ON THE EXECUTORS, one per partition, no driver materialization.
  *  - [[writeTileConfig]] emits the run-level JSON config (a tiny
  *    driver-side artifact listing produced layers, like the
  *    reference's tileserver-gl config).
  */
object External {

  /** Pipe every partition's rows (serialized as compact JSON lines)
    * through `cmd`; returns the command's stdout lines. */
  def pipePartitions(df: DataFrame, cmd: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(to_json(struct(col("*"))).as("line")).as[String]
      .rdd.pipe(cmd).toDF("line")
  }

  /** Compact tileserver-style config: {"styles":{},"data":{<name>:
    * {"pbf":"<dir>/<name>"}}} — the shape of the reference's config
    * write (precipitation_pipeline.py:315-347), minus server paths. */
  def writeTileConfig(layerNames: Seq[String], dataDir: String, outPath: String): Unit = {
    // JSON string escaping — unescaped quotes/backslashes/control
    // chars in a layer name or path would emit malformed JSON
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val entries = layerNames.sorted.map { n =>
      s""""${esc(n)}":{"pbf":"${esc(s"$dataDir/$n")}"}"""
    }.mkString(",")
    Files.writeString(Paths.get(outPath), s"""{"styles":{},"data":{$entries}}""")
  }
}
