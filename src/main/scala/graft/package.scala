package object graft {
  /** Every operator in the engine is exposed as a pure query:
    * (session, scale-factor dir) => DataFrame. Registered in
    * [[graft.SparkEntry.queries]]; driver-verified against DuckDB.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame

  /** Spread CPU-heavy narrow work across cores before it runs.
    *
    * The harness tables arrive as ONE parquet split, which pins any
    * narrow pipeline downstream of the scan — regex projections, JSON
    * rendering, signature hashing, aggregation partials, sink writes —
    * to a single core (observed 1-of-32 utilization). An explicit
    * numPartitions is used because REPARTITION_BY_NUM is exempt from
    * AQE partition coalescing, which would otherwise fold a
    * small-by-BYTES but CPU-expensive dataset back onto one core.
    *
    * At production scale a scan arrives as thousands of splits and this
    * exchange is unnecessary — it corrects the single-file-source
    * artifact, not the plan shape. The shuffled rows are narrow; the
    * shuffle is trivial next to the per-row CPU it parallelizes.
    */
  def spread(df: org.apache.spark.sql.DataFrame,
      keys: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(n, keys: _*)
  }
}
