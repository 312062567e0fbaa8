package graft

/** Generic guardrails over the whole declared inventory:
  * every query builds a plan, executes at sf0.001, and every oracle key
  * refers to a declared query. Specific semantic tests live in per-module
  * suites.
  */
class QueriesSpec extends SparkSuite {

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // Execute the plan; most queries must be non-empty at sf0.001.
      val n = df.count()
      assert(n >= 0)
    }
  }
}
