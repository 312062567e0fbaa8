package graft.ops

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Round 14 semantic pins for the Extras43 batch. */
class Round14Spec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("timeseries_rolling_corr: correlations bounded, strong counts partition") {
    val rows = q("timeseries_rolling_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_windows")
      val pos = r.getAs[Long]("n_strong_pos")
      val neg = r.getAs[Long]("n_strong_neg")
      assert(pos + neg <= n, s"strong counts exceed windows for $r")
      if (!r.isNullAt(r.fieldIndex("mean_corr_q")))
        assert(math.abs(r.getAs[Double]("mean_corr_q")) <= 1.0 + 1e-6)
    }
  }

  test("timeseries_realized_volatility: non-negative, delta count < month length") {
    val rows = q("timeseries_realized_volatility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("realized_vol") >= 0.0)
      assert(r.getAs[Long]("n_deltas") <= 30)
    }
  }

  test("analytics_order_fill_rate: buckets partition the line count exactly") {
    val rows = q("analytics_order_fill_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("on_time") + r.getAs[Long]("late_1_7") +
        r.getAs[Long]("late_8_30") + r.getAs[Long]("late_over_30")
      assert(total == r.getAs[Long]("n_lines"),
        s"aging buckets must partition: $r")
      val fr = r.getAs[Double]("fill_rate")
      assert(fr >= 0.0 && fr <= 1.0)
    }
  }

  test("clean_winsorize: fences ordered, winsorized mean inside them, ~5% tails") {
    val rows = q("clean_winsorize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      assert(lo <= hi)
      val mw = r.getAs[Double]("mean_wins")
      assert(mw >= lo - 0.01 && mw <= hi + 0.01,
        s"winsorized mean must lie inside the fences: $r")
      val n = r.getAs[Long]("n")
      // exact-percentile fences clip at most ~5% + interpolation slack
      assert(r.getAs[Long]("clipped_lo") <= n * 0.06 + 1)
      assert(r.getAs[Long]("clipped_hi") <= n * 0.06 + 1)
    }
  }

  test("scale_robust_median_iqr: |z|>2 tail is a minority, checksum is finite") {
    val rows = q("scale_robust_median_iqr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("iqr") > 0)
      assert(r.getAs[Long]("n_beyond_2") < r.getAs[Long]("n"),
        s"a median/IQR scale cannot put every row beyond 2: $r")
    }
  }

  test("encode_percentile_rank: ranks in [0,1] and monotone within a segment") {
    val rows = q("encode_percentile_rank").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("band"))
      val ranks = ordered.map(_.getAs[Double]("pct_rank"))
      assert(ranks.head == 0.0, "lowest band must rank 0")
      assert(ranks.forall(p => p >= 0.0 && p <= 1.0))
      assert(ranks.zip(ranks.tail).forall { case (a, b) => a <= b },
        "percentile rank must be monotone in the band")
    }
  }

  test("stats_psi_by_group: PSI is non-negative up to quantization slack") {
    val rows = q("stats_psi_by_group").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // each (p−q)ln(p/q) term is ≥ 0; floor-quantization can shave ≤1e-9
      // per band off the sum
      assert(r.getAs[Double]("psi") >= -1e-6, s"PSI must be ≥ 0: $r")
      assert(r.getAs[Long]("n_bands") <= 10)
    }
  }

  test("graph_bipartite_projection: canonical pair order, weights ranked") {
    val rows = q("graph_bipartite_projection").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach(r => assert(r.getAs[Long]("sa") < r.getAs[Long]("sb")))
    val ws = rows.map(_.getAs[Long]("shared_parts"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    assert(ws.forall(_ >= 1))
  }

  test("events_transition_entropy_rate: 0 ≤ H ≤ ln(fan-out), counts consistent") {
    val rows = q("events_transition_entropy_rate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val k = r.getAs[Long]("n_dst_types")
      assert(h >= -1e-6, s"entropy cannot be negative: $r")
      assert(h <= math.log(k.toDouble) + 1e-4,
        s"conditional entropy cannot exceed ln(#destinations): $r")
      assert(r.getAs[Long]("n_transitions") >= k)
    }
  }

  test("events_transition_entropy_rate matches a single-window recompute") {
    // kernel parity: the distributedLag predecessor chain must reproduce
    // the plain per-user window lag exactly (DistributedLagSpec pins the
    // kernel generally; this pins THIS consumer's wiring)
    val e = graft.Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val direct = e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("src"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("events_transition_entropy_rate").collect().foreach { r =>
      assert(r.getAs[Long]("n_transitions") == direct(r.getAs[String]("src")),
        s"kernel transition count drifted for ${r.getAs[String]("src")}")
    }
  }

  test("analytics_seasonal_index: Σ index·n_months = n_all per nation (identity)") {
    // si = (rev_m/n_m)/(rev_all/n_all) ⇒ Σ_m si·n_m = n_all — broken by
    // any normalization or join-grain bug
    val rows = q("analytics_seasonal_index").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("c_nationkey")).foreach { case (nk, rs) =>
      val weighted = rs.map(r =>
        r.getAs[Double]("seasonal_index") * r.getAs[Long]("n_months")).sum
      val nAll = rs.map(_.getAs[Long]("n_months")).sum
      assert(math.abs(weighted - nAll) < 0.01 * nAll + 0.1,
        s"nation $nk: Σ si·n_m = $weighted but n_all = $nAll")
    }
  }
}
