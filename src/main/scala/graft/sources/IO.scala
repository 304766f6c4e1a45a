package graft.sources

import java.nio.file.Files
import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Climate

/** File-format surface (SURVEY §2.1): CSV and JSON scans and sinks and
  * the hive-partitioned sink — the reference's actual IO contract
  * (pd.read_csv precipitation_pipeline.py:150; csv.DictReader
  * population_pipeline.py:39-41; json.load population_pipeline.py:54-55;
  * compact json.dump humidity_pipeline.py:170-172; one file per
  * (year,month) precipitation_pipeline.py:123-144).
  *
  * Every query is a ROUND TRIP through a fresh temp directory — sink
  * then scan — so the oracle (which reads the original parquet tables)
  * verifies both directions: any loss in quoting, header handling,
  * timestamp formatting, or partition encoding breaks the hash match.
  *
  * Schemas are always DECLARED on read, never inferred (SURVEY §1.4):
  * inference is nondeterministic under scale-out sampling and an extra
  * full pass at 100 TB.
  *
  * Scale posture: writes go through the normal committer with one file
  * per task — `partitionBy(year, month)` yields the reference's
  * monthly-file contract as a parallel hive layout; none of these
  * operators coalesce to a single file.
  */
object IO {

  /** Per-process scratch root, recursively deleted at JVM exit — the
    * round-trip queries run repeatedly (warmup + timed + verify) and
    * must not accumulate table copies under /tmp across runs. */
  private lazy val scratchRoot: java.nio.file.Path = {
    val root = Files.createTempDirectory("graft_io_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root.toFile)
    }))
    root
  }

  private[graft] def tmp(prefix: String): String =
    Files.createTempDirectory(scratchRoot, prefix).toString

  /** Eager recursive delete for callers that want cleanup before JVM
    * exit (tests dropping their warehouse dirs). */
  private[graft] def rmTree(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  val NationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val RegionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, Q] = Map(
    // Header CSV sink + schema'd scan (pd.read_csv / df.to_csv shape).
    "q_scan_csv" -> ((s, d) => {
      val out = tmp("graft_csv_")
      Tables.nation(s, d).write.mode("overwrite")
        .option("header", true).csv(out)
      s.read.option("header", true).schema(NationSchema).csv(out)
        .orderBy(col("n_nationkey"))
    }),

    // JSON-lines sink + schema'd scan (json.load shape).
    "q_scan_json" -> ((s, d) => {
      val out = tmp("graft_json_")
      Tables.region(s, d).write.mode("overwrite").json(out)
      s.read.schema(RegionSchema).json(out).orderBy(col("r_regionkey"))
    }),

    // CSV sink with explicit timestamp format, verified by aggregating
    // the re-scan (timestamps are where CSV round trips silently rot).
    "q_sink_csv" -> ((s, d) => {
      val out = tmp("graft_sinkcsv_")
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderdate", TimestampNTZType),
        StructField("o_totalprice", DoubleType)))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .write.mode("overwrite")
        .option("header", true).option("timestampNTZFormat", TsFmt).csv(out)
      s.read.option("header", true).option("timestampNTZFormat", TsFmt)
        .schema(schema).csv(out)
        .agg(count(lit(1)).as("n"),
          min(col("o_orderdate")).as("min_date"),
          max(col("o_orderdate")).as("max_date"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // Compact single-object-per-line JSON sink (json.dump with
    // separators=(',',':')) + from_json parse back. graft.spread
    // first: the single-split harness file would otherwise render +
    // write every JSON line from one task.
    "q_sink_json" -> ((s, d) => {
      val out = tmp("graft_sinkjson_")
      graft.spread(Tables.events(s, d), col("event_id"))
        .select(to_json(struct(col("event_id"), col("event_type"),
          round(col("value"), 4).as("v"))).as("value"))
        .write.mode("overwrite").text(out)
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("v", DoubleType)))
      s.read.text(out)
        .select(from_json(col("value"), schema).as("r"))
        .select(col("r.event_id"), col("r.event_type"), col("r.v"))
        .orderBy(col("event_id"))
    }),

    // Hive (year,month)-partitioned sink — the reference's
    // file-per-month contract — verified by re-scanning the layout and
    // aggregating per partition (partition values come back from
    // directory names, so wrong layout = wrong rows).
    "q_sink_partitioned" -> ((s, d) => {
      val out = tmp("graft_sinkpart_")
      val n = s.conf.get("spark.sql.shuffle.partitions").toInt
      // repartition ON the partition columns before partitionBy — the
      // canonical partitioned-sink shape: each (year,month) hashes to
      // exactly one task, so every partition directory gets exactly ONE
      // file (vs. one file per task×partition — the small-files problem
      // that kills 100 TB sinks) and the write parallelizes across
      // tasks instead of running from the source's single split.
      Climate.withYearMonth(Tables.orders(s, d), "o_orderdate")
        .repartition(n, col("year"), col("month"))
        .write.partitionBy("year", "month").mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("year").cast("int").as("year"),
          col("month").cast("int").as("month"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("year"), col("month"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_scan_csv" -> "SELECT * FROM nation ORDER BY n_nationkey",
    "q_scan_json" -> "SELECT * FROM region ORDER BY r_regionkey",
    "q_sink_csv" ->
      """SELECT count(*) AS n, min(o_orderdate) AS min_date,
        |       max(o_orderdate) AS max_date,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders""".stripMargin,
    "q_sink_json" ->
      """SELECT event_id, event_type, round(value, 4) AS v
        |FROM events ORDER BY event_id""".stripMargin,
    "q_sink_partitioned" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS year,
        |       CAST(month(o_orderdate) AS INT) AS month,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
