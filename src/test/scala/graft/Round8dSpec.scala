package graft

import graft.functions.StringSimKernels
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Round-8 fourth-session kernels: full Damerau-Levenshtein
  * (DuckDB-parity Lowrance-Wagner form) and the drift/stats invariants
  * the oracle hash alone doesn't articulate. */
class Round8dSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  private def dl(a: String, b: String): Int =
    StringSimKernels.damerauLevenshtein(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("DamerauLevenshtein kernel pins the DuckDB (full, not OSA) variant") {
    // the distinguishing case: full DL edits CA→AC→ABC in 2; the
    // restricted OSA variant needs 3 (probed against DuckDB directly)
    assert(dl("CA", "ABC") == 2)
    assert(dl("abc", "ca") == 2)
    // adjacent transpositions cost 1 (levenshtein charges 2)
    assert(dl("ab", "ba") == 1)
    assert(dl("teh", "the") == 1)
    assert(dl("xabx", "xbax") == 1)
    assert(dl("abcdef", "abcfed") == 2)
    // classic levenshtein cases unchanged when no transposition helps
    assert(dl("kitten", "sitting") == 3)
    assert(dl("", "abc") == 3)
    assert(dl("a", "") == 1)
    assert(dl("", "") == 0)
    assert(dl("same", "same") == 0)
  }

  test("DamerauLevenshtein invariants vs levenshtein on part-name pairs") {
    // DL(a,b) ≤ lev(a,b) always; symmetric; 0 iff equal; ≤ max length
    val rows = Tables(spark, sf, "part")
      .select(col("p_name"),
        concat(substring(col("p_name"), 1, 2), substring(col("p_name"), 4, 1),
          substring(col("p_name"), 3, 1), expr("substring(p_name, 5)")).as("t"))
      .withColumn("lev", levenshtein(col("p_name"), col("t")))
      .withColumn("dl", GraftOps.damerauLevenshtein(col("p_name"), col("t")))
      .withColumn("dl_rev", GraftOps.damerauLevenshtein(col("t"), col("p_name")))
      .limit(500).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, t) = (r.getString(0), r.getString(1))
      val (lev, d, dRev) = (r.getInt(2), r.getInt(3), r.getInt(4))
      assert(d <= lev, s"DL > lev on ($a, $t)")
      assert(d == dRev, s"asymmetric on ($a, $t)")
      assert((d == 0) == (a == t))
      assert(d <= math.max(a.length, t.length))
      // the swap perturbation is exactly one adjacent transposition
      if (a != t && a.charAt(2) != a.charAt(3)) assert(d == 1 && lev == 2)
    }
  }

  test("drift_ks is a valid KS statistic and drift_psi terms sum to the total row") {
    val ks = SparkEntry.queries("drift_ks")(spark, sf).collect().head
    assert(ks.getLong(0) > 0 && ks.getLong(1) > 0)
    val stat = ks.getDouble(2)
    assert(stat >= 0.0 && stat <= 1.0)
    val psi = SparkEntry.queries("drift_psi")(spark, sf).collect()
    assert(psi.length == 11)
    val (total, bins) = psi.partition(_.getLong(0) == -1L)
    val sumTerms = bins.map(r => BigDecimal(r.getDouble(5))).sum
    // the total row is the exact decimal sum of the 10 per-bin terms
    assert((sumTerms - BigDecimal(total.head.getDouble(5))).abs < BigDecimal("1e-9"))
    // smoothed probabilities are proper: Σ(n_i+1)/(N+10) over 10 bins = 1
    assert(math.abs(bins.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(math.abs(bins.map(_.getDouble(4)).sum - 1.0) < 1e-9)
  }

  test("stats_regression_group: r2 in [0,1], slope matches Spark's regr_slope") {
    val got = SparkEntry.queries("stats_regression_group")(spark, sf).collect()
    assert(got.length == 3)
    val ref = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("s"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("i"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    got.foreach { r =>
      val (flag, slope, icept, r2) =
        (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(r2 >= 0.0 && r2 <= 1.0)
      val (rs, ri) = ref(flag)
      assert(math.abs(slope - rs) < 1e-3, s"$flag slope $slope vs regr_slope $rs")
      assert(math.abs(icept - ri) < 1.0, s"$flag intercept $icept vs $ri")
    }
  }

  test("profile_gini lies in [0,1) and matches a collected reference") {
    val got = SparkEntry.queries("profile_gini")(spark, sf).collect().head
    val gini = got.getDouble(2)
    assert(gini >= 0.0 && gini < 1.0)
    // in-memory reference over the same per-customer spend
    val xs = Tables(spark, sf, "orders").groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("x"))
      .collect().map(_.getDouble(1)).sorted
    val n = xs.length.toDouble
    val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val refGini = 2.0 * s1 / (n * xs.sum) - (n + 1.0) / n
    assert(math.abs(gini - refGini) < 1e-6)
  }

  test("text_bm25_topk ranks the rare-term docs first") {
    val got = SparkEntry.queries("text_bm25_topk")(spark, sf).collect()
    assert(got.length == 20)
    val scores = got.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-_: Double)), "not score-descending")
    // every top doc must actually contain a query term; the top doc
    // should contain the rare term 'dup' (idf ~3 vs ~0.2 for the rest)
    val topDoc = got.head.getLong(0)
    val txt = Tables(spark, sf, "documents")
      .where(col("doc_id") === topDoc).collect().head.getAs[String]("text")
    assert(txt.toLowerCase.split(" ").contains("dup"))
  }

  test("events_sessionize partitions each user's events into gap-bounded sessions") {
    val sessions = SparkEntry.queries("events_sessionize")(spark, sf).collect()
    assert(sessions.nonEmpty)
    val nEvents = Tables(spark, sf, "events").count()
    assert(sessions.map(_.getLong(2)).sum == nEvents, "every event in exactly one session")
    sessions.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getLong(1))
      // session ids are 1..k dense per user; sessions don't overlap in time
      assert(sorted.map(_.getLong(1)).sameElements(1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) - a.getLong(4) > 43200000000L,
            "consecutive sessions must be separated by more than the gap")
        case _ =>
      }
    }
    sessions.foreach { r =>
      assert(r.getLong(4) >= r.getLong(3))
      assert(r.getLong(5) == (r.getLong(4) - r.getLong(3)) / 1000000L)
    }
  }

  test("stats_mannwhitney: U within range, z matches an in-memory midrank reference") {
    val row = SparkEntry.queries("stats_mannwhitney")(spark, sf).collect().head
    val (n1, n2, u) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(u >= 0 && u <= n1.toDouble * n2)
    // in-memory reference with midranks
    val vals = Tables(spark, sf, "orders")
      .select(col("o_totalprice"), (col("o_orderdate") < lit("1998-01-01")
        .cast("timestamp")).as("ref")).collect()
      .map(r => (r.getDouble(0), r.getBoolean(1)))
    val sorted = vals.sortBy(_._1)
    val ranks = scala.collection.mutable.Map[Double, Double]()
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      ranks(sorted(i)._1) = (i + 1 + j) / 2.0 // average of ranks i+1..j
      i = j
    }
    val r1 = vals.filter(_._2).map(v => ranks(v._1)).sum
    val refU = r1 - n1.toDouble * (n1 + 1) / 2.0
    assert(math.abs(u - refU) < 1e-6, s"U $u vs reference $refU")
  }

  test("stats_ttest_welch matches an in-memory Welch computation") {
    val row = SparkEntry.queries("stats_ttest_welch")(spark, sf).collect().head
    val groups = Tables(spark, sf, "customer")
      .where(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
      .select("c_mktsegment", "c_acctbal").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    def stats(xs: Array[Double]) = {
      val n = xs.length; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(groups("AUTOMOBILE"))
    val (nb, mb, vb) = stats(groups("BUILDING"))
    val refT = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(math.abs(row.getDouble(6) - refT) < 1e-3, s"t=${row.getDouble(6)} vs $refT")
  }

  test("profile_lorenz_deciles: shares sum to 1, cum_share monotone, last = 1") {
    val rows = SparkEntry.queries("profile_lorenz_deciles")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-12)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getDouble(4) > a.getDouble(4), "cum_share strictly increasing")
        assert(b.getDouble(3) >= a.getDouble(3) - 1e-12,
          "decile shares non-decreasing (sorted ascending by spend)")
      case _ =>
    }
  }

  test("drift_js total is symmetric-bounded: 0 <= JS <= ln 2") {
    val rows = SparkEntry.queries("drift_js")(spark, sf).collect()
    val total = rows.find(_.getLong(0) == -1L).get.getDouble(5)
    assert(total >= 0.0 && total <= math.log(2.0) + 1e-12)
  }

  test("encode_onehot rows are valid indicator vectors") {
    val rows = SparkEntry.queries("encode_onehot")(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "customer").count())
    rows.foreach { r =>
      val ind = (1 to 5).map(r.getLong)
      assert(ind.forall(v => v == 0L || v == 1L) && ind.sum == 1L,
        "exactly one indicator set per row")
    }
  }

  test("encode_target_mean excludes the row's own target (leave-one-out)") {
    val enc = SparkEntry.queries("encode_target_mean")(spark, sf).collect()
    val orders = Tables(spark, sf, "orders").join(
      Tables(spark, sf, "customer"),
      col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment", "o_totalprice").collect()
    val bySeg = orders.groupBy(_.getString(1))
      .view.mapValues(rs => (rs.map(_.getDouble(2)).sum, rs.length)).toMap
    val target = orders.map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    enc.take(500).foreach { r =>
      val (seg, y) = target(r.getLong(0))
      val (s2, n) = bySeg(seg)
      assert(math.abs(r.getDouble(2) - (s2 - y) / (n - 1)) < 1e-4)
    }
  }

  test("graph_pagerank: positive ranks descending, hubs rank above leaves") {
    val ranks = SparkEntry.queries("graph_pagerank")(spark, sf).collect()
    assert(ranks.length == 25)
    val vals = ranks.map(_.getDouble(1))
    assert(vals.forall(_ > 0.0))
    assert(vals.sameElements(vals.sortBy(-_: Double)))
    // the top PageRank node must be a top-degree hub (3 iterations on a
    // near-regular co-purchase graph track degree closely)
    val topDeg = SparkEntry.queries("graph_degree_topk")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(topDeg.contains(ranks.head.getLong(0)),
      s"top-ranked ${ranks.head.getLong(0)} not in top-degree set $topDeg")
  }

  test("timeseries_ohlc: high/low bound open/close, counts cover all events") {
    val bars = SparkEntry.queries("timeseries_ohlc")(spark, sf).collect()
    assert(bars.nonEmpty)
    assert(bars.map(_.getLong(1)).sum == Tables(spark, sf, "events").count())
    bars.foreach { b =>
      val (h, l, o, c) = (b.getDouble(3), b.getDouble(4), b.getDouble(2), b.getDouble(5))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("window_running_distinct is per-user non-decreasing and ends at the true distinct count") {
    val rows = SparkEntry.queries("window_running_distinct")(spark, sf).collect()
    val truth = Tables(spark, sf, "events").groupBy("user_id")
      .agg(countDistinct("event_type").as("k")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(1)).foreach { case (u, rs) =>
      val ks = rs.map(_.getLong(2))
      assert(ks.min == 1L, "the temporally-first event must see k = 1")
      assert(ks.max == truth(u))
    }
  }

  test("text_zipf_fit: negative slope, r2 in (0,1]") {
    val row = SparkEntry.queries("text_zipf_fit")(spark, sf).collect().head
    assert(row.getLong(0) > 10)
    assert(row.getDouble(1) < 0.0, "Zipf slope must be negative")
    assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= 1.0)
  }

  test("timeseries_drawdown: non-negative, bounded by the value range") {
    val rows = SparkEntry.queries("timeseries_drawdown")(spark, sf).collect()
    assert(rows.nonEmpty)
    val range = Tables(spark, sf, "events")
      .agg(max(col("value")) - min(col("value"))).collect().head.getDouble(0)
    rows.foreach { r =>
      val dd = r.getDouble(3)
      assert(dd >= 0.0 && dd <= range)
      assert(r.getDouble(2) <= Tables(spark, sf, "events")
        .agg(max(col("value"))).collect().head.getDouble(0))
    }
  }

  test("events_attribution: every purchase appears once; clicks precede") {
    val att = SparkEntry.queries("events_attribution")(spark, sf).collect()
    val nPurch = Tables(spark, sf, "events")
      .where(col("event_type") === "purchase").count()
    assert(att.length == nPurch)
    att.foreach { r =>
      if (!r.isNullAt(3)) {
        assert(r.getLong(3) < r.getLong(2), "attributed click must be strictly prior")
        assert(r.getLong(4) == (r.getLong(2) - r.getLong(3)) / 1000000L)
      } else assert(r.isNullAt(4))
    }
  }

  test("profile_null_patterns: pattern bits agree with flags, rows total") {
    val pats = SparkEntry.queries("profile_null_patterns")(spark, sf).collect()
    assert(pats.map(_.getLong(4)).sum == Tables(spark, sf, "orders").count())
    pats.foreach { r =>
      assert(r.getLong(0) == 4 * r.getLong(1) + 2 * r.getLong(2) + r.getLong(3))
    }
  }

  test("sim_label_centroids: full label x dim grid, means within value range") {
    val cents = SparkEntry.queries("sim_label_centroids")(spark, sf).collect()
    val labels = Tables(spark, sf, "embeddings").select("label").distinct().count()
    assert(cents.length == labels * 64)
    cents.foreach { r => assert(math.abs(r.getDouble(3)) < 1.0) }
  }

  test("text_tfidf_cosine_pairs stays within blocks and cosine range") {
    val pairs = SparkEntry.queries("text_tfidf_cosine_pairs")(spark, sf)
    val docs = Tables(spark, sf, "documents").select("doc_id", "lang", "source")
    val a = docs.select(col("doc_id").as("doc_a"), col("lang").as("la"),
      col("source").as("sa"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang").as("lb"),
      col("source").as("sb"))
    val joined = pairs.join(a, "doc_a").join(b, "doc_b").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("la") == r.getAs[String]("lb"))
      assert(r.getAs[String]("sa") == r.getAs[String]("sb"))
      val c = r.getAs[Double]("cos")
      assert(c >= 0.8 && c <= 1.000001)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }
}
