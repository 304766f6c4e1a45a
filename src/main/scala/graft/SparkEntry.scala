package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family registers its queries (Q = (session, sfDir) =>
  * DataFrame) and the equivalent DuckDB oracle SQL; this object is the
  * single aggregation point the driver reads.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (Climate.queries, Climate.oracle),
    (Relational.queries, Relational.oracle),
    (Joins.queries, Joins.oracle),
    (Aggregations.queries, Aggregations.oracle),
    (Windows.queries, Windows.oracle),
    (graft.functions.Scalars.queries, graft.functions.Scalars.oracle),
    (TextOps.queries, TextOps.oracle),
    (Dedup.queries, Dedup.oracle),
    (Similarity.queries, Similarity.oracle),
    (Multimodal.queries, Multimodal.oracle),
    (Snapshot.queries, Snapshot.oracle),
    (Inference.queries, Inference.oracle),
    (Graph.queries, Graph.oracle),
    (Population.queries, Population.oracle),
    (graft.sources.IO.queries, graft.sources.IO.oracle),
    (graft.sources.zarr.Zarr.queries, graft.sources.zarr.Zarr.oracle),
    (graft.streaming.Streaming.queries, graft.streaming.Streaming.oracle),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Climate.monthlyAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = modules.map(_._2).reduce(_ ++ _)
}
