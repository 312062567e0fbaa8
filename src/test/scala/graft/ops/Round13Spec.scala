package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Round 13 semantic pins for the Extras41 batch. */
class Round13Spec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_incremental_maintenance equals a direct recompute of the final set") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val fin = o.where(col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 5 =!= 0)
      .unionAll(o.where(col("o_orderkey") % 3 === 0 && col("o_orderkey") % 2 === 0))
    val direct = fin.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        Tables.dsum(col("o_totalprice")).as("sum_price"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val inc = q("agg_incremental_maintenance").collect()
    assert(inc.nonEmpty)
    inc.foreach { r =>
      val (n, s) = direct(r.getString(0))
      assert(r.getLong(1) == n, s"count drifted for ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - s) < 1e-6,
        s"sum drifted for ${r.getString(0)}: inc=${r.getDouble(2)} direct=$s")
    }
  }

  test("encode_target_loo: the mean of LOO codes per segment equals the segment mean") {
    // Σ_i (S − v_i)/(n−1) / n = (nS − S)/(n(n−1)) = S/n — an algebraic
    // identity that any leakage bug (self-inclusion, off-by-one n) breaks.
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val segMean = c.groupBy("c_mktsegment").agg(avg("c_acctbal").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val looMean = q("encode_target_loo").groupBy("c_mktsegment")
      .agg(avg("loo_mean").as("lm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    looMean.foreach { case (seg, lm) =>
      assert(math.abs(lm - segMean(seg)) < 1e-3,
        s"$seg: mean(loo)=$lm vs mean=$segMean")
    }
  }

  test("profile_functional_dependencies: the key-based FD holds, behavioral ones are measured") {
    val rows = q("profile_functional_dependencies").collect()
      .map(r => r.getString(0) -> r).toMap
    val key = rows("orders.o_orderkey->o_orderstatus")
    assert(key.getAs[Boolean]("holds"), "a unique key must determine every column")
    assert(key.getAs[Long]("violating_rows") == 0L)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("violating_rows") <= r.getAs[Long]("n_rows"))
      val ratio = r.getAs[Double]("viol_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("stats_cramers_v_matrix: V in [0,1] and cardinalities are real") {
    val rows = q("stats_cramers_v_matrix").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val v = r.getAs[Double]("cramers_v")
      assert(v >= 0.0 && v <= 1.0 + 1e-9, s"${r.getString(0)}: V=$v")
      assert(r.getAs[Long]("r_card") >= 2 && r.getAs[Long]("c_card") >= 2,
        s"${r.getString(0)}: degenerate contingency table")
    }
  }

  test("stats_split_gain: gains non-negative, thresholds non-decreasing, counts monotone") {
    val rows = q("stats_split_gain").collect()
    assert(rows.length == 9)
    // Gini gain of a binary split is never negative (weighted child
    // impurity ≤ parent impurity); deciles and their left-counts ascend.
    rows.foreach(r => assert(r.getAs[Double]("gain_gini") >= -1e-9))
    val ths = rows.map(_.getAs[Double]("threshold"))
    assert(ths.zip(ths.tail).forall { case (a, b) => a <= b })
    val nls = rows.map(_.getAs[Long]("n_left"))
    assert(nls.zip(nls.tail).forall { case (a, b) => a <= b })
  }

  test("stats_theil_sen_by_group matches a driver-side brute force at sf0.001") {
    val m = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
        ((year(col("o_orderdate")) - 1990) * 12 + month(col("o_orderdate")))
          .as("mi"))
      .agg(Tables.dsum(col("o_totalprice")).as("v"))
      .collect()
      .groupBy(_.getInt(0))
    val expected = m.map { case (nat, rows) =>
      val pts = rows.map(r => (r.getAs[Number]("mi").intValue(), r.getDouble(2)))
        .sortBy(_._1)
      val slopes = (for {
        (a, i) <- pts.zipWithIndex; b <- pts.drop(i + 1)
      } yield (b._2 - a._2) / (b._1 - a._1).toDouble).sorted
      nat -> slopes((slopes.length + 1) / 2 - 1) // lower median, 1-based
    }
    val got = q("stats_theil_sen_by_group").collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("theil_sen_slope")).toMap
    expected.foreach { case (nat, sl) =>
      assert(math.abs(got(nat) - sl) < 1e-5, s"nation $nat: ${got(nat)} vs $sl")
    }
  }

  test("sample_balanced_downsample: every class capped at the minority count") {
    val rows = q("sample_balanced_downsample").collect()
    assert(rows.nonEmpty)
    val minTotal = rows.map(_.getAs[Long]("n_total")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") == math.min(minTotal, r.getAs[Long]("n_total")),
        s"${r.getString(0)}: kept ${r.getAs[Long]("n_kept")} of min $minTotal")
    }
    // deterministic: the checksum of the selected ids is stable across runs
    val again = q("sample_balanced_downsample").collect()
    assert(rows.map(_.getAs[Long]("id_checksum")).toSeq ==
      again.map(_.getAs[Long]("id_checksum")).toSeq)
  }

  test("stats_kendall_tau_by_group: tau bounded, pair accounting closed") {
    val rows = q("stats_kendall_tau_by_group").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, d) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("concordant"),
        r.getAs[Long]("discordant"))
      assert(c + d <= n, "concordant + discordant must not exceed pairs")
      val tau = r.getAs[Double]("kendall_tau")
      assert(tau >= -1.0 && tau <= 1.0)
    }
  }

  test("encode_target_james_stein: codes shrink group means toward the global mean") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val global = c.agg(avg("c_acctbal")).head().getDouble(0)
    q("encode_target_james_stein").collect().foreach { r =>
      val (mg, code) = (r.getAs[Double]("mean_g"), r.getAs[Double]("js_code"))
      val (lo, hi) = (math.min(mg, global), math.max(mg, global))
      assert(code >= lo - 1e-6 && code <= hi + 1e-6,
        s"${r.getString(0)}: code $code outside [$lo, $hi]")
    }
  }

  test("events_dau_mau_stickiness: stickiness in (0, 1], avg_dau <= mau") {
    val rows = q("events_dau_mau_stickiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s0 = r.getAs[Double]("stickiness")
      assert(s0 > 0.0 && s0 <= 1.0 + 1e-9, s"ym ${r.get(0)}: stickiness $s0")
      assert(r.getAs[Double]("avg_dau") <= r.getAs[Long]("mau") + 1e-9)
    }
  }

  test("graph_degree_powerlaw_fit: alpha > 1 on a non-empty tail") {
    val r = q("graph_degree_powerlaw_fit").head()
    if (!r.isNullAt(r.fieldIndex("alpha"))) {
      assert(r.getAs[Long]("n_tail") >= 1)
      assert(r.getAs[Double]("alpha") > 1.0)
    }
  }

  test("graph_adamic_adar: only non-adjacent pairs, scores descend, hubs discounted") {
    val rows = q("graph_adamic_adar").collect()
    assert(rows.nonEmpty)
    val edges = Graph.strongEdgesCached(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, "pairs must be oriented")
      assert(!edges.contains((a, b)), s"($a,$b) is already an edge")
      assert(r.getAs[Long]("n_common") >= 1)
    }
    val scores = rows.map(_.getAs[Double]("aa_score"))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y - 1e-9 })
  }
}
