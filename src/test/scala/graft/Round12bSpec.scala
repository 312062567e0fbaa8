package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-12 batch (Extras39): privacy audits,
  * frequency encoding, multi-lag ACF. Each test recomputes the query's
  * contract from the raw table through an INDEPENDENT formulation and
  * asserts equality — the cross-engine hash gate is tools/check.py.
  */
class Round12bSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("profile_k_anonymity: per-k rows are consistent and monotone") {
    val rows = q("profile_k_anonymity").collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == Seq(2, 5, 10))
    val nCustomers = spark.read.parquet(s"$sf/customer.parquet").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nCustomers)
      assert(r.getAs[Long]("groups_below") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("rows_below") <= r.getAs[Long]("n_rows"))
      val share = r.getAs[Double]("at_risk_share")
      assert(share >= 0.0 && share <= 1.0)
    }
    // rows at risk can only grow as the privacy bar k rises
    val below = rows.map(_.getAs[Long]("rows_below")).toSeq
    assert(below == below.sorted, s"rows_below not monotone in k: $below")
    // independent recount of the k=2 row: singleton QI groups
    val sizes = spark.read.parquet(s"$sf/customer.parquet")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 100))
      .count()
    val singletons = sizes.where(col("count") === 1).count()
    assert(rows.head.getAs[Long]("groups_below") == singletons)
    assert(rows.head.getAs[Long]("rows_below") == singletons)
    assert(rows.head.getAs[Long]("min_group_size") >= 1L)
  }

  test("profile_l_diversity: histogram partitions all customers and blocks") {
    val rows = q("profile_l_diversity").collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    assert(rows.map(_.getAs[Long]("n_rows")).sum == cust.count())
    val blocks = cust.groupBy(col("c_nationkey"),
      floor(col("c_acctbal") / 500)).count().count()
    assert(rows.map(_.getAs[Long]("n_groups")).sum == blocks)
    val nSegments = cust.select("c_mktsegment").distinct().count()
    assert(rows.map(_.getAs[Long]("l")).max <= nSegments)
    assert(rows.map(_.getAs[Long]("l")).min >= 1L)
  }

  test("encode_frequency: census counts are exact and shares sum to ~1") {
    val out = q("encode_frequency")
    val parts = spark.read.parquet(s"$sf/part.parquet")
    assert(out.count() == parts.count())
    val expected = parts.groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.select("p_brand", "brand_cnt").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    val shareSum = out.select("p_brand", "brand_freq").distinct().collect()
      .map(_.getDouble(1)).sum
    // round-6 truncation over ~|brands| terms
    assert(math.abs(shareSum - 1.0) < 1e-3, s"freqs sum to $shareSum")
  }

  test("timeseries_acf_lags matches a driver-side exact recompute") {
    val out = q("timeseries_acf_lags").collect()
      .map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(out.nonEmpty && out.keySet.subsetOf((1 to 7).toSet))
    out.values.foreach { case (_, acf) =>
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9) }
    // independent recompute: collect the (tiny) daily series as exact
    // integer ten-thousandths and apply the same exact-then-double
    // formula per lag in BigInt arithmetic
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,4)")) * 10000)
        .cast("long").as("rev"))
      .collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay ->
        BigInt(r.getLong(1))).toMap
    (1 to 7).foreach { lag =>
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d - lag).map(y => (x, y)) }
      if (pairs.size >= 3) {
        val n = pairs.size.toDouble
        def dbl(b: BigInt) = b.toDouble
        val sx = dbl(pairs.map(_._1).sum)
        val sy = dbl(pairs.map(_._2).sum)
        val sxy = dbl(pairs.map(p => p._1 * p._2).sum)
        val sx2 = dbl(pairs.map(p => p._1 * p._1).sum)
        val sy2 = dbl(pairs.map(p => p._2 * p._2).sum)
        val acf = (n * sxy - sx * sy) /
          (math.sqrt(n * sx2 - sx * sx) * math.sqrt(n * sy2 - sy * sy))
        assert(out.contains(lag), s"lag $lag missing from output")
        assert(out(lag)._1 == pairs.size.toLong)
        assert(math.abs(out(lag)._2 - acf) < 1e-5,
          s"lag $lag: got ${out(lag)._2}, recomputed $acf")
      } else assert(!out.contains(lag))
    }
  }

  test("pipeline_curriculum_stages: 4 balanced stages with ordered score spans") {
    val rows = q("pipeline_curriculum_stages").collect()
    assert(rows.map(_.getAs[Int]("stage")).toSeq == Seq(1, 2, 3, 4))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // SQL-ntile balance: bucket sizes differ by at most one
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, s"unbalanced stages: ${sizes.toSeq}")
    // stages are ordered by score: span i ends no later than span i+1 starts
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("score_hi") <= b.getAs[Long]("score_lo"),
        s"stage ${a.getAs[Int]("stage")} overlaps ${b.getAs[Int]("stage")}")
    }
  }

  test("text_length_histogram_by_source: buckets are exact binary lengths") {
    val rows = q("text_length_histogram_by_source").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("n_chars") > 0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // independent recount in the driver
    val expected = docs.select("source", "n_chars").collect()
      .map(r => (r.getString(0),
        java.lang.Long.toBinaryString(r.getLong(1)).length))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = rows.map(r => (r.getString(0), r.getAs[Int]("bucket")) ->
      r.getAs[Long]("n_docs")).toMap
    assert(got == expected)
    rows.foreach { r =>
      assert(r.getAs[Long]("share_e6") >= 0 &&
        r.getAs[Long]("share_e6") <= 1000000L)
    }
  }

  test("text_char_trigram_entropy: bounds and exact gram totals") {
    val rows = q("text_char_trigram_entropy").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .where(length(col("text")) >= 3)
    val expTotals = docs.groupBy("lang")
      .agg(sum(length(col("text")) - 2).as("g")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == expTotals.keySet)
    rows.foreach { r =>
      val (lang, nGrams, nDistinct, h) = (r.getString(0), r.getAs[Long](1),
        r.getAs[Long](2), r.getAs[Double](3))
      assert(nGrams == expTotals(lang))
      assert(nDistinct >= 1 && nDistinct <= nGrams)
      // 0 ≤ H ≤ ln(n_distinct) (uniform bound), slack for per-term rounding
      assert(h >= 0.0 && h <= math.log(nDistinct.toDouble) + 1e-6,
        s"$lang entropy $h outside [0, ln($nDistinct)]")
    }
  }

  test("events_inter_arrival_burstiness matches a driver-side recompute") {
    val rows = q("events_inter_arrival_burstiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b >= -1.0 - 1e-9 && b <= 1.0 + 1e-9, s"burstiness $b out of range")
      assert(r.getAs[Long]("n_gaps") >= 5L)
    }
    // recompute one user end-to-end with BigInt sufficient statistics
    val uid = rows.head.getAs[Long]("user_id")
    val ts = Tables(spark, sf, "events")
      .where(col("user_id") === uid)
      .select(unix_timestamp(col("ts")).as("t"))
      .collect().map(_.getLong(0)).sorted
    val gaps = ts.sliding(2).map(p => BigInt(p(1) - p(0))).toSeq
    val n = gaps.size.toDouble
    val s1 = gaps.sum.toDouble
    val s2 = gaps.map(g => g * g).sum.toDouble
    val mean = s1 / n
    val std = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1.0)))
    val expB = (std - mean) / (std + mean)
    assert(rows.head.getAs[Long]("n_gaps") == gaps.size.toLong)
    assert(math.abs(rows.head.getAs[Double]("burstiness") - expB) < 1e-5)
  }

  test("profile_t_closeness: thresholds monotone, t bounded by [0,1]") {
    val rows = q("profile_t_closeness").collect()
    assert(rows.map(_.getAs[Double]("threshold")).toSeq == Seq(0.2, 0.35, 0.5))
    val maxT = rows.head.getAs[Double]("max_t")
    assert(maxT >= 0.0 && maxT <= 1.0, s"max TV distance $maxT outside [0,1]")
    // rows/blocks above a RISING threshold can only shrink
    val blocks = rows.map(_.getAs[Long]("blocks_above")).toSeq
    assert(blocks == blocks.sorted.reverse, s"not monotone: $blocks")
    val above = rows.map(_.getAs[Long]("rows_above")).toSeq
    assert(above == above.sorted.reverse, s"not monotone: $above")
    // a threshold above max_t admits no blocks
    rows.filter(_.getAs[Double]("threshold") > maxT).foreach { r =>
      assert(r.getAs[Long]("blocks_above") == 0L)
    }
  }

  test("events_type_affinity_jaccard matches a driver-side recompute") {
    val rows = q("events_type_affinity_jaccard").collect()
    assert(rows.nonEmpty)
    val sets = Tables(spark, sf, "events")
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val inter = sets(a).intersect(sets(b)).size
      assert(r.getAs[Long]("n_a") == sets(a).size.toLong)
      assert(r.getAs[Long]("n_b") == sets(b).size.toLong)
      assert(r.getAs[Long]("n_both") == inter.toLong)
      val expJ = inter.toDouble / (sets(a).size + sets(b).size - inter)
      assert(math.abs(r.getAs[Double]("jaccard") - expJ) < 1e-5)
    }
  }

  test("graph_modularity_partition: contributions sum to a valid Q") {
    val rows = q("graph_modularity_partition").collect()
    assert(rows.nonEmpty)
    val qMod = rows.map(_.getAs[Double]("contribution")).sum
    // Newman bound: Q ∈ [−1/2, 1); slack for per-row rounding
    assert(qMod >= -0.5 - 1e-4 && qMod < 1.0, s"modularity $qMod out of range")
    // degree mass identity: Σ_c S_c = 2W, and e_within ≤ S_c/2
    val sDeg = rows.map(_.getAs[Long]("s_degree")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("e_within") * 2 <= r.getAs[Long]("s_degree")) }
    val w = rows.map(_.getAs[Long]("e_within")).sum
    assert(sDeg % 2 == 0 && w <= sDeg / 2)
  }

  test("agg_percentile_cont_by_group matches a driver-side lerp recompute") {
    val rows = q("agg_percentile_cont_by_group").collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (tpe, rs) =>
      assert(rs.map(_.getAs[Double]("q")).sorted.toSeq ==
        Seq(0.25, 0.5, 0.75, 0.9))
      val xs = Tables(spark, sf, "events")
        .where(col("event_type") === tpe && col("value").isNotNull)
        .select("value").collect().map(_.getDouble(0)).sorted
      rs.foreach { r =>
        assert(r.getAs[Long]("n") == xs.length.toLong)
        val pos = (xs.length - 1).toDouble * r.getAs[Double]("q")
        val k = math.floor(pos).toInt
        val hi = math.min(k + 1, xs.length - 1)
        val exp = xs(k) + (pos - k) * (xs(hi) - xs(k))
        assert(math.abs(r.getAs[Double]("p_cont") - exp) < 1e-5,
          s"$tpe q=${r.getAs[Double]("q")}: ${r.getAs[Double]("p_cont")} vs $exp")
      }
    }
  }

  test("sample_stratified_neyman: shares sum to 1, budget respected") {
    val rows = q("sample_stratified_neyman").collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("neyman_share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to $shares")
    val alloc = rows.map(_.getAs[Long]("alloc_n")).sum
    // floor() loses at most one unit per stratum off the 1000 budget
    assert(alloc <= 1000L && alloc >= 1000L - rows.length)
    rows.foreach { r =>
      assert(r.getAs[Double]("std_h") >= 0.0)
      assert(r.getAs[Long]("alloc_n") >= 0L)
    }
    // driver-side recompute of one stratum's std over exact BigInt sums
    val pri = rows.head.getString(0)
    val vs = Tables(spark, sf, "orders")
      .where(col("o_orderpriority") === pri)
      .select((col("o_totalprice").cast("decimal(18,4)") * 10000)
        .cast("decimal(38,0)").as("v"))
      .collect().map(r => BigInt(r.getDecimal(0).toBigInteger))
    val n = vs.size.toDouble
    val (s1, s2) = (vs.sum.toDouble, vs.map(v => v * v).sum.toDouble)
    val expStd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))) / 10000.0
    assert(math.abs(rows.head.getAs[Double]("std_h") - expStd) < 1e-4,
      s"$pri: ${rows.head.getAs[Double]("std_h")} vs $expStd")
  }
}
