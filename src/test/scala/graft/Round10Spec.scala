package graft

import org.apache.spark.sql.functions._

/** Round-10 operators: Kaplan-Meier survival, Holt seasonal forecast,
  * label-propagation communities, mergeable quantile sketch. Each query
  * is pinned against an independent scalar reimplementation (not just
  * the DuckDB oracle) so a shared construction bug can't pass both. */
class Round10Spec extends SparkSuite {
  private val spark0 = TestSpark.spark

  test("kaplan_meier: invariants + scalar recompute matches the plan") {
    val out = SparkEntry.queries("survival_kaplan_meier")(spark0, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    assert(out.nonEmpty)
    // survival is non-increasing and within [0, 1]
    out.map(_._5).foldLeft(1.0) { (prev, s) =>
      assert(s <= prev + 1e-12 && s >= 0.0 && s <= 1.0, s"survival $s after $prev")
      s
    }
    // at-risk countdown is consistent: n_at_risk(t_i+1) =
    // n_at_risk(t_i) − (events + censored at t_i)
    out.sliding(2).foreach {
      case Array((_, n1, d1, c1, _), (_, n2, _, _, _)) =>
        assert(n2 == n1 - d1 - c1, s"at-risk chain broke: $n1 - $d1 - $c1 != $n2")
      case _ =>
    }
    // first at-risk count is the full population; everyone exits exactly once
    val total = out.head._2
    assert(out.map(r => r._3 + r._4).sum == total)
    // independent scalar KM (same ln-quantization) reproduces survival
    var lnS = BigDecimal(0)
    out.foreach { case (t, n, d, _, s) =>
      if (n == d) () // zero factor: survival pinned to 0 from here
      else lnS += BigDecimal(math.log((n - d).toDouble / n))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      val expect =
        if (out.takeWhile(_._1 <= t).exists(r => r._2 == r._3)) 0.0
        else BigDecimal(math.exp(lnS.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(s - expect) < 1e-9, s"t=$t survival $s != scalar $expect")
    }
  }

  test("holt_winters: scalar fold over the actual monthly sums reproduces forecasts") {
    val o = Tables(spark0, sf, "orders")
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"),
        col("o_totalprice").cast("decimal(18,4)").as("rev"))
      .groupBy("ym").agg(sum("rev").cast("double").as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    def m(ym: Int): Double = o.getOrElse(ym, 0.0)
    val mean24 = ((1 to 12).map(j => m(199900 + j)) ++
      (1 to 12).map(j => m(200000 + j))).reduce(_ + _) / 24.0
    val seas = (1 to 12).map(j =>
      j -> ((m(199900 + j) + m(200000 + j)) / 2.0 - mean24)).toMap
    val d = (1 to 6).map(j => m(200100 + j) - seas(j))
    var l = d(0); var b = d(1) - d(0)
    (2 to 6).foreach { t =>
      val lN = 0.5 * d(t - 1) + 0.5 * (l + b)
      b = 0.25 * (lN - l) + 0.75 * b; l = lN
    }
    val expect = (1 to 3).map(h => l + h * b + seas(6 + h))
    val got = SparkEntry.queries("forecast_holt_winters")(spark0, sf)
      .orderBy("h").collect().map(_.getDouble(2)).toSeq
    assert(got.size == 3)
    // same fold, scalar vs Catalyst: must agree bit-for-bit
    got.zip(expect).foreach { case (g, e) =>
      assert(g == e, s"forecast $g != scalar fold $e")
    }
  }

  test("label_propagation: memberships partition the node set, deterministic") {
    val run1 = SparkEntry.queries("graph_label_propagation")(spark0, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val run2 = SparkEntry.queries("graph_label_propagation")(spark0, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run1 == run2, "label propagation is not deterministic")
    assert(run1.nonEmpty && run1.forall(_._2 >= 1))
    // top-25 communities can't exceed the graph's node count
    val e = ops.Graph.coOccurrenceEdges(
      Tables(spark0, sf, "lineitem"), "l_orderkey", "l_partkey", 2L)
    val nNodes = e.select(col("pa").as("p"))
      .unionAll(e.select(col("pb").as("p"))).distinct().count()
    assert(run1.map(_._2).sum <= nNodes)
  }

  test("quantile sketch: shard-merge == direct histogram; exact within bucket") {
    val rows = SparkEntry.queries("profile_quantile_sketch_mergeable")(spark0, sf)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getBoolean(6), s"exact ${r.getDouble(5)} outside " +
        s"[${r.getDouble(3)}, ${r.getDouble(4)}) for q=${r.getDouble(0)}")
    }
    // mergeability: summing the 32 shard sketches equals the histogram
    // built in one pass over the raw column
    val width = 214.84375
    val li = Tables(spark0, sf, "lineitem")
    val direct = li.select(floor(col("l_extendedprice") / width).cast("long").as("b"))
      .groupBy("b").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaShards = li
      .select((col("l_orderkey") % 32L).as("s"),
        floor(col("l_extendedprice") / width).cast("long").as("b"))
      .groupBy("s", "b").count()
      .groupBy("b").agg(sum("count").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct == viaShards, "shard-merged sketch != direct histogram")
    assert(rows.head.getLong(1) == li.count())
  }
}
