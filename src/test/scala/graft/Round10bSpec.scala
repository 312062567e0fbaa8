package graft

import org.apache.spark.sql.functions._

/** Round-10 batches 2–4: property pins beyond the oracle — the CMS
  * overcount guarantee on EVERY key, shard contiguity/balance bounds,
  * threshold-sweep monotonicity, and the RecodeValues semantics. */
class Round10bSpec extends SparkSuite {
  private val spark0 = TestSpark.spark
  import spark0.implicits._

  test("CMS overcount guarantee holds for EVERY key, not just the top-10") {
    // rebuild the 4x512 sketch the query uses and probe all keys
    val keys = Tables(spark0, sf, "lineitem")
      .select(col("l_partkey").cast("long").as("k"))
    val a = Seq(1299721L, 15485863L, 32452843L, 49979687L)
    val b = Seq(104729L, 224737L, 350377L, 479909L)
    def bucket(i: Int, k: org.apache.spark.sql.Column) =
      ((lit(a(i)) * k + lit(b(i))) % 2147483647L) % 512L
    val sketch = (0 until 4).map { i =>
      keys.select(lit(i.toLong).as("row_id"), bucket(i, col("k")).as("bucket"))
        .groupBy("row_id", "bucket").agg(count(lit(1)).as("cnt"))
    }.reduce(_ unionAll _)
    val truth = keys.groupBy("k").agg(count(lit(1)).as("true_cnt"))
    val probes = truth.select(col("k"), col("true_cnt"),
      explode(array((0 until 4).map(i =>
        struct(lit(i.toLong).as("row_id"), bucket(i, col("k")).as("bucket"))): _*))
        .as("p"))
      .select(col("k"), col("true_cnt"), col("p.row_id"), col("p.bucket"))
    val est = probes.join(sketch, Seq("row_id", "bucket"))
      .groupBy("k", "true_cnt").agg(min(col("cnt")).as("est"))
    val bad = est.where(col("est") < col("true_cnt")).count()
    assert(bad == 0, s"$bad keys under-counted — CMS guarantee broken")
  }

  test("token shards are contiguous id ranges with bounded imbalance") {
    val rows = SparkEntry.queries("pipeline_token_shard_assign")(spark0, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    // contiguity: each shard's first doc follows the previous shard's last
    rows.sliding(2).foreach {
      case Array((_, _, _, _, last1), (_, _, _, first2, _)) =>
        assert(first2 > last1, s"shard ranges overlap: $last1 >= $first2")
      case _ =>
    }
    // balance: every shard within one max-doc-size of the ideal share
    val maxTok = Tables(spark0, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(max(col("t"))).head().getLong(0)
    val total = rows.map(_._3).sum
    val ideal = total.toDouble / rows.length
    rows.foreach { case (sh, _, tok, _, _) =>
      assert(math.abs(tok - ideal) <= maxTok + ideal / rows.length + 1,
        s"shard $sh mass $tok too far from ideal $ideal (maxTok $maxTok)")
    }
  }

  test("threshold sweep is monotone and removals never exceed pairs") {
    val rows = SparkEntry.queries("dedup_threshold_sweep")(spark0, sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 4)
    rows.sliding(2).foreach {
      case Array((_, p1, r1), (_, p2, r2)) =>
        assert(p2 <= p1 && r2 <= r1, "sweep not monotone in threshold")
      case _ =>
    }
    rows.foreach { case (t, p, rm) =>
      assert(rm <= p, s"removals $rm exceed pairs $p at theta=$t")
    }
  }

  test("RecodeValues maps listed values, passes through others and nulls") {
    val df = Seq(Some("view"), Some("click"), Some("purchase"), None)
      .toDF("et")
    val out = clean.RecodeValues("et", Seq("view", "click"),
      Seq("pageview", "tap"))(df)
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(Some("pageview"), Some("tap"), Some("purchase"), None))
  }

  test("GraftExtensions wires rule + SQL functions through spark.sql.extensions") {
    val base = TestSpark.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      // reuses the existing SparkContext. spark.sql.extensions is a
      // STATIC conf read at SparkContext creation, so the config route
      // can't engage on a shared test context — withExtensions runs the
      // SAME class through the SAME injection path the config route uses.
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new plans.GraftExtensions()(_))
        .getOrCreate()
      assert(s2 ne base, "expected a fresh session for the extension test")
      val r = s2.sql(
        "SELECT graft_jaro_winkler('martha', 'marhta') AS jw, " +
          "graft_dot(array(cast(1.0 as double), cast(2.0 as double)), " +
          "array(cast(3.0 as double), cast(4.0 as double))) AS d").head()
      assert(math.abs(r.getDouble(0) - 0.961111) < 1e-6, s"jw ${r.getDouble(0)}")
      assert(r.getDouble(1) == 11.0)
      // bloom build + probe round-trips through the injected SQL forms
      val b = s2.sql(
        """WITH keys AS (SELECT explode(array(1L, 2L, 3L)) AS k),
          |bloom AS (SELECT graft_bloom_build(k, 256, 3) AS bf FROM keys)
          |SELECT graft_bloom_might_contain(bf, 2L) AS hit,
          |       graft_bloom_might_contain(bf, 999999L) AS miss
          |FROM bloom""".stripMargin).head()
      assert(b.getBoolean(0), "bloom lost a member")
      // the optimizer rule is installed in the extended batch
      assert(s2.sessionState.optimizer.extendedOperatorOptimizationRules
        .contains(plans.JaroWinklerPrefilter),
        "JaroWinklerPrefilter not injected")
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("vocab coverage curve: thresholds nest and never exceed vocab size") {
    val r = SparkEntry.queries("text_vocab_coverage_curve")(spark0, sf).head()
    val (nv, w50, w90, w99) = (r.getLong(0), r.getLong(2), r.getLong(3),
      r.getLong(4))
    assert(w50 <= w90 && w90 <= w99 && w99 <= nv)
    assert(w50 >= 0 && nv > 0)
  }
}
