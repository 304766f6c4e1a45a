package object graft {
  /** Every operator in the engine is exposed as a pure query:
    * (session, scale-factor dir) => DataFrame. Registered in
    * [[graft.SparkEntry.queries]]; driver-verified against DuckDB.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
