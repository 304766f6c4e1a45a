package graft

/** Smoke-level contract for every registered query: it must plan,
  * execute at sf0.001, and (for all but filters that legitimately
  * drain) return rows. Semantic assertions live in the per-module
  * specs; the DuckDB oracle (driver-run + tools/compare.py) is the
  * row-level correctness gate.
  */
class QueriesSpec extends SparkTestBase {

  // queries whose correct sf0.001 result may be empty (q_join_fuzzy:
  // ~200 parts hold no within-block Levenshtein-≤3 pair; sf0.01+ do)
  private val mayBeEmpty = Set("q_except", "q_join_anti", "q_join_fuzzy")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, "schema must be non-empty")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle entry has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
