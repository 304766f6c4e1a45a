package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Schema contract of the adaptive events.ts read (Tables.scala):
  * the harness has shipped events.ts in THREE physical encodings
  * across regenerations, and a regeneration once flipped the type
  * mid-round and broke 42 tests before the read was made adaptive.
  * This suite pins the contract: each recorded encoding normalizes
  * to the same session-TZ TIMESTAMP instants, and a FOURTH encoding
  * fails loudly at the read with a diagnostic naming the stored type
  * — never in whichever downstream query trips over it first.
  */
class TablesSpec extends SparkTestBase {

  // one µs-grained instant (all recorded encodings are µs-grained)
  private val isoTs = "2023-06-15 12:34:56.789123"
  private val epochUs = 1686832496789123L

  private def writeEvents(dir: String, mk: org.apache.spark.sql.DataFrame): Unit =
    mk.write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def readBack(dir: String): (String, Long) = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"events() must yield session-TZ TIMESTAMP, got ${df.schema("ts").dataType}")
    val r = df.select(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"),
      unix_micros(col("ts")).as("us")).head()
    (r.getString(0), r.getLong(1))
  }

  test("encoding 1 (INT64 nanos, read as long under nanosAsLong): div-normalized") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_nanos_").toString
    // the nanos encoding is OBSERVED as LongType under the guard conf;
    // a plain INT64 ts column reproduces that observable shape exactly
    writeEvents(dir, Seq((1L, epochUs * 1000L)).toDF("event_id", "ts"))
    assert(readBack(dir) == (isoTs, epochUs))
  }

  test("encoding 2 (TIMESTAMP_NTZ micros): relabeled to the UTC session TZ") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_ntz_").toString
    writeEvents(dir, Seq((1L, epochUs)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    assert(readBack(dir) == (isoTs, epochUs))
  }

  test("encoding 3 (session-TZ TIMESTAMP): passes through unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_ts_").toString
    writeEvents(dir, Seq((1L, epochUs)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts")))
    assert(readBack(dir) == (isoTs, epochUs))
  }

  test("a fourth encoding fails loudly at the read, naming the stored type") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_bad_").toString
    writeEvents(dir, Seq((1L, isoTs)).toDF("event_id", "ts"))
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts stored as string")
      && e.getMessage.contains("harness encodings"),
      s"diagnostic must name the stored type and the contract, got: ${e.getMessage}")
  }
}
