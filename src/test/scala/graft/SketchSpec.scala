package graft

import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters aggregate: the MG guarantees (presence of
  * every heavy hitter, bounded under-estimate) must hold on any input
  * ORDER and PARTITIONING; the sketch must be exact when the distinct
  * count fits the capacity; and the declared contract query's booleans
  * must be true by construction. */
class SketchSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  private def topk(rows: Seq[(String, String)], capacity: Int,
      partitions: Int): Map[String, Map[String, Long]] =
    GraftOps.approxTopValues(
        rows.toDF("g", "v").repartition(partitions), Seq("g"), "v", capacity)
      .collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(it => it.getString(0) -> it.getLong(1)).toMap
      }.toMap

  test("exact counts when distinct values fit the capacity") {
    val rows = Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
    for (p <- Seq(1, 3, 8)) {
      val got = topk(rows.map(("g1", _)), capacity = 4, partitions = p)("g1")
      assert(got == Map("a" -> 7L, "b" -> 4L, "c" -> 2L),
        s"distinct <= capacity must be exact (partitions=$p): $got")
    }
  }

  test("MG guarantee holds under any partitioning: heavy present, est bounded") {
    // 2000 rows: hotA 30%, hotB 20%, 100 cold values ~1% each
    val rows = new scala.util.Random(11).shuffle(
      Seq.fill(600)("hotA") ++ Seq.fill(400)("hotB") ++
        (0 until 1000).map(i => s"cold${i % 100}"))
    val n = rows.length
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (c <- Seq(4, 8, 16); p <- Seq(1, 5, 32)) {
      val sketch = topk(rows.map(("g1", _)), c, p)("g1")
      assert(sketch.size <= c, s"capacity $c exceeded: ${sketch.size}")
      val slack = n.toDouble / (c + 1)
      exact.foreach { case (v, cnt) =>
        if (cnt > slack)
          assert(sketch.contains(v), s"heavy $v (cnt=$cnt) missing at c=$c p=$p")
      }
      sketch.foreach { case (v, est) =>
        val cnt = exact(v)
        assert(est <= cnt && cnt - est <= slack,
          s"estimate out of bounds at c=$c p=$p: $v est=$est exact=$cnt slack=$slack")
      }
      // rank fidelity: the true top-1 is also the sketch's top estimate
      // (its est lower bound 600 - slack exceeds any other value's cnt
      //  upper bound for every capacity tested)
      assert(sketch.maxBy(_._2)._1 == "hotA")
    }
  }

  test("groups aggregate independently; all-null group yields an empty sketch") {
    val rows = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"),
      ("g3", null))
    val got = GraftOps.approxTopValues(rows.toDF("g", "v"), Seq("g"), "v", 4)
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1))
      .toMap
    assert(got("g1").map(it => (it.getString(0), it.getLong(1))).toSet ==
      Set(("x", 2L), ("y", 1L)))
    assert(got("g2").map(it => (it.getString(0), it.getLong(1))) == Seq(("z", 1L)))
    assert(got("g3").isEmpty, "all-null group must give [] not null")
  }

  test("sketch output is sorted by est desc, item asc") {
    val rows = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(2)("c")
    val arr = GraftOps.approxTopValues(rows.map(("g", _)).toDF("g", "v"),
        Seq("g"), "v", 8)
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(it => (it.getString(0), it.getLong(1)))
    assert(arr == Seq(("a", 5L), ("b", 5L), ("c", 2L)), arr.toString)
  }

  test("MG survives the sort-based ObjectHashAggregate fallback (spill path)") {
    // TypedImperativeAggregate runs under ObjectHashAggregateExec, which
    // falls back to sort-based aggregation past the in-memory key
    // threshold — the path a 100 TB group count takes. Force it with a
    // tiny threshold: 500 groups all flow through serialize/sort/merge,
    // and each group's ≤-capacity sketch must still be EXACT.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "4")
    try {
      val rows = (0 until 500).flatMap { g =>
        Seq.fill(3)((s"g$g", "x")) ++ Seq((s"g$g", "y"))
      }
      val df = GraftOps.approxTopValues(
        rows.toDF("g", "v").repartition(16), Seq("g"), "v", 4)
      val got = df.collect().map { r =>
          r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(it => (it.getString(0), it.getLong(1)))
        }.toMap
      // self-verify the coverage: without these, a renamed conf key or a
      // planner change would silently route this through the plain hash
      // path and the test would stop pinning the spill path at all
      // AQE hides executed stages behind childless QueryStageExec /
      // AdaptiveSparkPlanExec wrappers — flatten through them explicitly
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          p +: allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: allNodes(q.plan)
        case _ => p +: p.children.flatMap(allNodes)
      }
      val oha = allNodes(df.queryExecution.executedPlan).collect {
        case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => o
      }
      assert(oha.nonEmpty, "misraGries no longer plans ObjectHashAggregate")
      assert(oha.exists(_.metrics("numTasksFallBacked").value > 0),
        "sort-based fallback never engaged — threshold conf not biting")
      assert(got.size == 500)
      got.foreach { case (g, items) =>
        assert(items == Seq(("x", 3L), ("y", 1L)), s"$g corrupted on spill: $items")
      }
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("approxTopValues groups by multiple columns") {
    val rows = Seq(("a", 1, "x"), ("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z"))
      .toDF("g1", "g2", "v")
    val got = GraftOps.approxTopValues(rows, Seq("g1", "g2"), "v", 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        r.getSeq[org.apache.spark.sql.Row](2).map(it => (it.getString(0), it.getLong(1))))
      .toMap
    assert(got(("a", 1)) == Seq(("x", 2L)))
    assert(got(("a", 2)) == Seq(("y", 1L)))
    assert(got(("b", 1)) == Seq(("z", 1L)))
  }

  test("non-string categoricals cast through the entry point; raw expression rejects them") {
    val rows = Seq(("g", 5L), ("g", 5L), ("g", 7L)).toDF("g", "v")
    val got = GraftOps.approxTopValues(rows, Seq("g"), "v", 4)
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(it => (it.getString(0), it.getLong(1)))
    assert(got == Seq(("5", 2L), ("7", 1L)), got.toString)
    // the raw aggregate (no cast) must fail at analysis, not on executors
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val raw = ColumnBridge.column(graft.functions.MisraGriesTopK(
      ColumnBridge.expression(col("v")), 4).toAggregateExpression())
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      rows.groupBy(col("g")).agg(raw).collect()
    }
    assert(e.getMessage.contains("misra_gries_topk requires a string column"),
      e.getMessage)
  }

  test("profile_topk_approx contract booleans hold on the declared testdata") {
    val rows = SparkEntry.queries("profile_topk_approx")(spark, sf).collect()
    assert(rows.length == 5, "one row per event_type")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_heavy") >= 1, s"skew derivation lost its hot values: $r")
      assert(r.getAs[Boolean]("heavy_in_sketch"), s"MG presence guarantee violated: $r")
      assert(r.getAs[Boolean]("est_bounded"), s"MG estimate bound violated: $r")
    }
  }
}
