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

  // legitimately empty at sf0.001: every customer has an order (join_anti);
  // set_except may drain when suppliers cover all nations
  private val mayBeEmpty = Set("join_anti", "set_except")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes and is non-empty at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("pipeline_shuffle_deterministic is a reproducible non-identity permutation") {
    def run() = SparkEntry.queries("pipeline_shuffle_deterministic")(spark, sf)
      .collect().map(_.getLong(0))
    val ids = run()
    assert(ids.toSet.size == ids.length, "shuffle dropped or duplicated docs")
    assert(ids.take(20).toSeq != ids.sorted.take(20).toSeq,
      "shuffle order is the identity — no scatter")
    assert(ids.toSeq == run().toSeq, "shuffle not reproducible across runs")
  }

  test("approx_count_distinct stays within the declared error bound") {
    val row = SparkEntry.queries("agg_approx_distinct")(spark, sf).head()
    assert(row.getAs[Boolean]("approx_ok"),
      s"HLL drifted beyond the declared 3x-rsd bound: $row")
  }
}
