package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 14 batch 2: evaluation metrics (rank-based AUC, Cohen's d,
  * Brown-Forsythe variance-homogeneity test), market-basket cross-sell
  * lift, importance-weighted sampling, week-over-week growth, and a
  * target-ordered ordinal encoder.
  *
  * Same float discipline as Extras41-43: rank statistics ride the
  * distributed prefix-sum kernel as exact 2×midrank integers (the
  * stats_mannwhitney machinery), every |x−med| is quantized before
  * squaring so sufficient sums stay exact int64, and each final
  * statistic is a single fixed IEEE tree rounded to 6.
  */
object Extras44 {

  val queries: Map[String, Q] = Map(

    // ROC AUC of line price as a predictor of the return flag, via the
    // rank-sum identity AUC = (R₊ − n₊(n₊+1)/2)/(n₊n₋) with tie-averaged
    // midranks. The fact reduces to the distinct-VALUE census first; the
    // prefix sum over the census rides the two-level kernel (never one
    // global window over fact rows); 2×midranks keep everything integral
    // until the final division. Gini = 2·AUC − 1 for free.
    "stats_auc_roc" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select(
        col("l_extendedprice").as("v"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
      val perV = li.groupBy("v").agg(
        sum(col("r")).as("np"), sum(lit(1L) - col("r")).as("nn"))
        .withColumn("cnt", col("np") + col("nn"))
        .withColumn("g", lit(1))
      val cum = GraftOps.distributedRunningSum(
        perV, "g", "v", "cnt", "cb", exclusive = true)
      cum.agg(
          sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
          sum(col("np") * (lit(2L) * col("cb") + col("cnt") + 1L)).as("rpx2"))
        .select(col("n_pos"), col("n_neg"),
          (round((col("rpx2") - col("n_pos") * (col("n_pos") + 1L))
            .cast(DoubleType) /
            (lit(2.0) * (col("n_pos") * col("n_neg")).cast(DoubleType)), 6)
            + lit(0.0)).as("auc"))
        .withColumn("gini", round(col("auc") * 2 - 1, 6) + lit(0.0))
    },

    // Cross-sell lift matrix at part-TYPE grain: for type pairs sharing
    // an order basket, lift = P(a,b)/(P(a)·P(b)) over order baskets.
    // The fact reduces to distinct (order, type) FIRST; the pair
    // expansion is per-basket (≤ C(distinct types per basket, 2)) and
    // the output grain is type×type — dimension-bounded. Top-50 by
    // support with the full unique tie-break; lift is one IEEE tree
    // over exact counts.
    "analytics_cross_sell_lift" -> { (s, dir) =>
      val items = Tables(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        .join(Tables(s, dir, "part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_type").as("t"))
        .distinct()
        // r14 note: a localCheckpoint here (the table feeds four plan
        // branches) was tried and REVERTED — exchange reuse already
        // dedups the distinct's shuffle across the branches, so the
        // materialization was pure overhead (sweep 1.50 s → 2.45 s).
      val nOrders = items.select("ok").distinct()
        .agg(count(lit(1)).as("n_orders"))
      val perType = items.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
      val pairs = items.select(col("ok"), col("t").as("ta"))
        .join(items.select(col("ok"), col("t").as("tb")), Seq("ok"))
        .where(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
      pairs
        .join(perType.select(col("t").as("ta"), col("n_t").as("n_a")), "ta")
        .join(perType.select(col("t").as("tb"), col("n_t").as("n_b")), "tb")
        .crossJoin(broadcast(nOrders))
        .select(col("ta"), col("tb"), col("n_ab"),
          (round((col("n_ab") * col("n_orders")).cast(DoubleType) /
            (col("n_a") * col("n_b")).cast(DoubleType), 6) + lit(0.0))
            .as("lift"))
        .orderBy(col("n_ab").desc, col("ta"), col("tb"))
        .limit(50)
    },

    // Importance-weighted corpus sampling: each doc kept with
    // probability ∝ its length, decided by a deterministic Knuth hash —
    // reproducible across engines, retries, and partitionings (the
    // sample_balanced_downsample discipline; doc_id reduced mod 2³¹−1
    // before the multiply so the product can't overflow). Pure integer
    // acceptance test: h % 10⁶ < 10⁶·n_chars DIV max_chars. The id-sum
    // checksum pins the EXACT selected set.
    "sample_importance_weighted" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("h",
          ((col("doc_id") % 2147483647L) * 2654435761L) % 2147483647L)
      val mx = d.agg(max(col("n_chars")).as("max_chars"))
      d.crossJoin(broadcast(mx))
        .select(col("lang"), col("doc_id"), col("n_chars"),
          (col("h") % 1000000L <
            expr("(n_chars * 1000000) DIV max_chars")).as("sel"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sel"), 1L).otherwise(0L)).as("n_selected"),
          sum(when(col("sel"), col("n_chars")).otherwise(0L)).as("chars_selected"),
          sum(when(col("sel"), col("doc_id")).otherwise(0L)).as("id_checksum"))
        .orderBy("lang")
    },

    // Cohen's d effect size for every market-segment pair: standardized
    // mean difference with the pooled SD, entirely from exact decimal
    // sufficient statistics (Σx as decimal(18,4), Σx² as decimal(38,8))
    // so both engines build the identical IEEE tree. 10-row output.
    "stats_cohens_d_by_group" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_mktsegment"),
        col("c_acctbal").cast("decimal(12,4)").as("x"))
      val g = c.groupBy("c_mktsegment").agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("qx"))
      // pair expansion via the 1-row collect_list broadcast + explode:
      // the BNLJ stays UNCONDITIONED (the allowed scalar pattern — the
      // `<` filter lands AFTER the Generate, on the exploded column, so
      // Catalyst cannot push it into the join; a bare `<` join or a
      // foldable constant equi-key both plan the conditioned BNLJ the
      // PlanSpec guard forbids)
      val a = g.select(col("c_mktsegment").as("seg_a"), col("n").as("na"),
        col("sx").as("sa"), col("qx").as("qa"))
      val allRow = g.agg(collect_list(struct(
        col("c_mktsegment").as("seg_b"), col("n").as("nb"),
        col("sx").as("sb"), col("qx").as("qb"))).as("all"))
      val ma = col("sa").cast(DoubleType) / col("na").cast(DoubleType)
      val mb = col("sb").cast(DoubleType) / col("nb").cast(DoubleType)
      val ssa = col("qa").cast(DoubleType) -
        col("sa").cast(DoubleType) * col("sa").cast(DoubleType) /
          col("na").cast(DoubleType)
      val ssb = col("qb").cast(DoubleType) -
        col("sb").cast(DoubleType) * col("sb").cast(DoubleType) /
          col("nb").cast(DoubleType)
      val sp = sqrt((ssa + ssb) / (col("na") + col("nb") - 2).cast(DoubleType))
      a.crossJoin(broadcast(allRow))
        .select(col("seg_a"), col("na"), col("sa"), col("qa"),
          explode(col("all")).as("b"))
        .select(col("seg_a"), col("na"), col("sa"), col("qa"),
          col("b.seg_b").as("seg_b"), col("b.nb").as("nb"),
          col("b.sb").as("sb"), col("b.qb").as("qb"))
        .where(col("seg_a") < col("seg_b"))
        .select(col("seg_a"), col("seg_b"), col("na"), col("nb"),
          (round((ma - mb) / sp, 6) + lit(0.0)).as("cohens_d"))
        .orderBy("seg_a", "seg_b")
    },

    // Week-over-week revenue growth per nation. Weeks are integral
    // day-offsets from a fixed pre-corpus Monday (1990-01-01) DIV 7 —
    // every diff is positive so truncating DIV ≡ floor `//`, and there
    // are no ISO week-year boundary semantics to disagree on; revenue
    // is exact whole units; growth is one IEEE division on a
    // calendar-bounded lag window.
    "timeseries_week_over_week_growth" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val wk = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey"),
          expr("datediff(o_orderdate, DATE'1990-01-01') DIV 7").as("wk"))
        .agg(floor(sum(dec(col("o_totalprice")))).cast(LongType).as("rev"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey").orderBy("wk")
      wk.withColumn("prev", lag(col("rev"), 1).over(w))
        .select(col("c_nationkey"), col("wk"), col("rev"),
          when(col("prev") > 0,
            round((col("rev") - col("prev")).cast(DoubleType) /
              col("prev").cast(DoubleType), 6) + lit(0.0)).as("wow_growth"))
        .orderBy("c_nationkey", "wk")
    },

    // Brown-Forsythe (median-centered Levene) variance-homogeneity test
    // across market segments: W from |x − med_g| quantized to 1e-3
    // (so zq² sums stay exact int64 past sf10⁴), group medians via the
    // proven percentile discipline, the statistic one fixed IEEE tree.
    "stats_levene_test" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_mktsegment"),
        col("c_acctbal").cast(DoubleType).as("x"))
      val med = c.groupBy("c_mktsegment").agg(
        round(expr("percentile(x, 0.5)"), 4).as("med"))
      val z = c.join(broadcast(med), "c_mktsegment")
        .select(col("c_mktsegment"),
          floor(abs(col("x") - col("med")) * 1000).cast(LongType).as("zq"))
      val g = z.groupBy("c_mktsegment").agg(
        count(lit(1)).as("ng"), sum(col("zq")).as("sg"),
        sum(col("zq") * col("zq")).as("qg"))
      g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n_total"),
          sum(col("sg")).as("s_all"),
          // within-group SS: Σ_g (Qg − Sg²/ng), quantized-integer exact
          // inputs, double tree
          sum(col("qg").cast(DoubleType) -
            col("sg").cast(DoubleType) * col("sg").cast(DoubleType) /
              col("ng").cast(DoubleType)).as("ss_within"),
          sum(col("sg").cast(DoubleType) * col("sg").cast(DoubleType) /
            col("ng").cast(DoubleType)).as("sum_sg2_ng"))
        .select(col("k"), col("n_total"),
          (round(((col("n_total") - col("k")).cast(DoubleType) /
            (col("k") - 1).cast(DoubleType)) *
            ((col("sum_sg2_ng") -
              col("s_all").cast(DoubleType) * col("s_all").cast(DoubleType) /
                col("n_total").cast(DoubleType)) / col("ss_within")), 6)
            + lit(0.0)).as("w_stat"))
    },

    // Ordinal encoder ordered by target mean: category → its rank in
    // the segment-mean ordering (the monotone-encode companion of
    // encode_target_mean). 5-row encoder table; the window runs over
    // the 5-row aggregate, never the fact.
    "encode_ordinal_by_target" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val g = c.groupBy("c_mktsegment").agg(
        count(lit(1)).as("n"), sum(dec(col("c_acctbal"))).as("sx"))
        .select(col("c_mktsegment"), col("n"),
          (round(col("sx").cast(DoubleType) / col("n").cast(DoubleType), 6)
            + lit(0.0)).as("target_mean"))
      // rank via the distributed prefix-sum kernel: even a 5-row global
      // row_number would plan Exchange SinglePartition -> Window, which
      // the full-suite guard forbids for ANY declared query (unique keys
      // make rank ≡ row_number)
      GraftOps.distributedRank(g, Seq("target_mean", "c_mktsegment", "n"),
          "ordinal_l")
        .select(col("c_mktsegment"), col("n"), col("target_mean"),
          col("ordinal_l").cast("int").as("ordinal"))
        .orderBy("ordinal")
    }
  )

  val oracle: Map[String, String] = Map(
    "stats_auc_roc" ->
      """WITH li AS (SELECT l_extendedprice AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        |  FROM lineitem),
        |perv AS (SELECT v, cast(sum(r) AS bigint) AS np,
        |    cast(sum(1 - r) AS bigint) AS nn,
        |    cast(count(*) AS bigint) AS cnt
        |  FROM li GROUP BY v),
        |cum AS (SELECT np, nn, cnt,
        |    cast(coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
        |      AS cb
        |  FROM perv),
        |agg AS (SELECT cast(sum(np) AS bigint) AS n_pos,
        |    cast(sum(nn) AS bigint) AS n_neg,
        |    cast(sum(np * (2 * cb + cnt + 1)) AS bigint) AS rpx2
        |  FROM cum)
        |SELECT n_pos, n_neg,
        |  round(cast(rpx2 - n_pos * (n_pos + 1) AS double) /
        |    (2.0 * cast(n_pos * n_neg AS double)), 6) + 0.0 AS auc,
        |  round(round(cast(rpx2 - n_pos * (n_pos + 1) AS double) /
        |    (2.0 * cast(n_pos * n_neg AS double)), 6) * 2 - 1, 6) + 0.0
        |    AS gini
        |FROM agg""".stripMargin,
    "analytics_cross_sell_lift" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS ok, p_type AS t
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |no AS (SELECT cast(count(DISTINCT ok) AS bigint) AS n_orders
        |  FROM items),
        |pt AS (SELECT t, cast(count(*) AS bigint) AS n_t FROM items
        |  GROUP BY t),
        |pr AS (SELECT a.t AS ta, b.t AS tb, cast(count(*) AS bigint) AS n_ab
        |  FROM items a JOIN items b ON a.ok = b.ok AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT ta, tb, n_ab,
        |  round(cast(n_ab * n_orders AS double) /
        |    cast(pa.n_t * pb.n_t AS double), 6) + 0.0 AS lift
        |FROM pr JOIN pt pa ON pr.ta = pa.t JOIN pt pb ON pr.tb = pb.t
        |CROSS JOIN no
        |ORDER BY n_ab DESC, ta, tb LIMIT 50""".stripMargin,
    "sample_importance_weighted" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |    ((doc_id % 2147483647) * 2654435761) % 2147483647 AS h
        |  FROM documents),
        |mx AS (SELECT max(n_chars) AS max_chars FROM documents)
        |SELECT lang, cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(CASE WHEN h % 1000000 <
        |    (n_chars * 1000000) // max_chars THEN 1 ELSE 0 END) AS bigint)
        |    AS n_selected,
        |  cast(sum(CASE WHEN h % 1000000 <
        |    (n_chars * 1000000) // max_chars THEN n_chars ELSE 0 END)
        |    AS bigint) AS chars_selected,
        |  cast(sum(CASE WHEN h % 1000000 <
        |    (n_chars * 1000000) // max_chars THEN doc_id ELSE 0 END)
        |    AS bigint) AS id_checksum
        |FROM d CROSS JOIN mx GROUP BY lang ORDER BY lang""".stripMargin,
    "stats_cohens_d_by_group" ->
      """WITH g AS (SELECT c_mktsegment, cast(count(*) AS bigint) AS n,
        |    sum(cast(c_acctbal AS decimal(12,4))) AS sx,
        |    sum(cast(c_acctbal AS decimal(12,4)) *
        |        cast(c_acctbal AS decimal(12,4))) AS qx
        |  FROM customer GROUP BY 1)
        |SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
        |  a.n AS na, b.n AS nb,
        |  round((cast(a.sx AS double) / cast(a.n AS double) -
        |         cast(b.sx AS double) / cast(b.n AS double)) /
        |    sqrt(((cast(a.qx AS double) -
        |        cast(a.sx AS double) * cast(a.sx AS double) /
        |          cast(a.n AS double)) +
        |      (cast(b.qx AS double) -
        |        cast(b.sx AS double) * cast(b.sx AS double) /
        |          cast(b.n AS double))) /
        |      cast(a.n + b.n - 2 AS double)), 6) + 0.0 AS cohens_d
        |FROM g a JOIN g b ON a.c_mktsegment < b.c_mktsegment
        |ORDER BY seg_a, seg_b""".stripMargin,
    "timeseries_week_over_week_growth" ->
      """WITH wk AS (SELECT c_nationkey,
        |    datediff('day', DATE '1990-01-01', o_orderdate) // 7 AS wk,
        |    cast(floor(sum(cast(o_totalprice AS decimal(18,4)))) AS bigint)
        |      AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |l AS (SELECT c_nationkey, wk, rev,
        |    lag(rev) OVER (PARTITION BY c_nationkey ORDER BY wk) AS prev
        |  FROM wk)
        |SELECT c_nationkey, wk, rev,
        |  CASE WHEN prev > 0 THEN
        |    round(cast(rev - prev AS double) / cast(prev AS double), 6) + 0.0
        |  END AS wow_growth
        |FROM l ORDER BY c_nationkey, wk""".stripMargin,
    "stats_levene_test" ->
      """WITH c AS (SELECT c_mktsegment, cast(c_acctbal AS double) AS x
        |  FROM customer),
        |m AS (SELECT c_mktsegment, round(quantile_cont(x, 0.5), 4) AS med
        |  FROM c GROUP BY 1),
        |z AS (SELECT c.c_mktsegment,
        |    cast(floor(abs(x - med) * 1000) AS bigint) AS zq
        |  FROM c JOIN m ON c.c_mktsegment = m.c_mktsegment),
        |g AS (SELECT c_mktsegment, cast(count(*) AS bigint) AS ng,
        |    cast(sum(zq) AS bigint) AS sg, cast(sum(zq * zq) AS bigint) AS qg
        |  FROM z GROUP BY 1),
        |t AS (SELECT cast(count(*) AS bigint) AS k,
        |    cast(sum(ng) AS bigint) AS n_total,
        |    cast(sum(sg) AS bigint) AS s_all,
        |    sum(cast(qg AS double) -
        |      cast(sg AS double) * cast(sg AS double) / cast(ng AS double))
        |      AS ss_within,
        |    sum(cast(sg AS double) * cast(sg AS double) / cast(ng AS double))
        |      AS sum_sg2_ng
        |  FROM g)
        |SELECT k, n_total,
        |  round((cast(n_total - k AS double) / cast(k - 1 AS double)) *
        |    ((sum_sg2_ng - cast(s_all AS double) * cast(s_all AS double) /
        |      cast(n_total AS double)) / ss_within), 6) + 0.0 AS w_stat
        |FROM t""".stripMargin,
    "encode_ordinal_by_target" ->
      """WITH g AS (SELECT c_mktsegment, cast(count(*) AS bigint) AS n,
        |    round(cast(sum(cast(c_acctbal AS decimal(18,4))) AS double) /
        |      cast(count(*) AS double), 6) + 0.0 AS target_mean
        |  FROM customer GROUP BY 1)
        |SELECT c_mktsegment, n, target_mean,
        |  cast(row_number() OVER (ORDER BY target_mean, c_mktsegment) AS int)
        |    AS ordinal
        |FROM g ORDER BY ordinal""".stripMargin
  )
}
