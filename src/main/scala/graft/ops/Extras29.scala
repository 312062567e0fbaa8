package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.expressions.Window

/** Round-10 tranche: survival analysis (Kaplan-Meier), Holt-style
  * seasonal forecasting, label-propagation communities, and a mergeable
  * quantile sketch — the four operators a data-curation/analytics user
  * reaches for next (churn curves, demand baselines, catalog communities,
  * and 100 TB-mergeable quantiles).
  */
object Extras29 {

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** fixed smoothing constants for the Holt fold — EXACT binary
    * fractions (1/2, 1/4), so every fold step is a fixed IEEE tree with
    * no representational divergence between engines. */
  private val monthsSeasonal: Seq[Int] =
    (1 to 12).map(m => 199900 + m) ++ (1 to 12).map(m => 200000 + m)
  private val monthsFold: Seq[Int] = (1 to 6).map(m => 200100 + m)

  /** Shared survival-analysis scaffold (Kaplan-Meier here, Nelson-Aalen
    * in Extras30): customer lifetime durations with 90-day censoring →
    * duration-grain (t, d events, c censored, n_at_risk), the at-risk
    * countdown riding the distributed prefix sum. */
  private[ops] def atRiskTable(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
    val cust = orders.groupBy("o_custkey")
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
    val maxd = orders.agg(max(col("d")).as("maxd"))
    // projection-only crossJoin of the 1-row max date (no filter → no
    // conditioned-BNLJ risk)
    val life = cust.crossJoin(broadcast(maxd))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("t"),
        when(datediff(col("maxd"), col("last_d")) > 90, 1L).otherwise(0L)
          .as("event"))
    // r14 (guide §2.4): grain feeds the prefix-sum kernel AND the final
    // join, and the result feeds two cumulative consumers in KM /
    // Nelson-Aalen — without checkpoints each consumer replayed the whole
    // customer-grain pipeline (the km_by_segment plan held 59 exchanges).
    // n_total now rolls up from grain instead of a second life pass
    // (sum of per-t counts ≡ count of life rows).
    val grain = life.groupBy("t").agg(
      sum(col("event")).as("d"),
      (count(lit(1)) - sum(col("event"))).as("c"),
      count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val tot = grain.agg(sum(col("cnt")).as("n_total"))
    // at-risk countdown: n_at_risk(t) = N − (inclusive cumsum − cnt)
    val cum1 = GraftOps.distributedRunningSum(
      grain.select(lit(0L).as("__p"), col("t"), col("cnt")),
      "__p", "t", "cnt", "cum_incl")
    grain.join(cum1.select("t", "cum_incl"), "t")
      .crossJoin(broadcast(tot))
      .select(col("t"), col("d"), col("c"),
        (col("n_total") - col("cum_incl") + col("cnt")).as("n_at_risk"))
      .localCheckpoint(false)
  }

  /** Shared Holt-fold scaffold: ONE wide 1-row aggregate (every monthly
    * dsum-exact sum, including the 2001-07 actual the backtest compares
    * against) → seasonal indices → deseasonalized d1..d6 → the unrolled
    * α=1/2 β=1/4 fold as named columns l1..l6 / b1..b6.
    *
    * EACH step is a named-column select over the previous one — composing
    * Scala Column vars instead would textually inline every step into the
    * next (l6/b6 reference l5 three times → the tree grows ~3× per fold
    * step; the inlined form measured 2.7 s of pure analysis/codegen on a
    * 1-row frame, the stepwise form ~0.3 s). The IEEE operation tree is
    * identical either way. */
  private[ops] def holtFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .select((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .as("ym"), col("o_totalprice").as("rev"))
    val allMonths = monthsSeasonal ++ monthsFold :+ 200107
    val aggs = allMonths.map(m =>
      coalesce(sum(when(col("ym") === m, dec(col("rev"))))
        .cast(DoubleType), lit(0.0)).as(s"m$m"))
    val wide = o.agg(aggs.head, aggs.tail: _*)
    def c(m: Int): Column = col(s"m$m")
    val withMean = wide.select(col("*"),
      (monthsSeasonal.map(c).reduce(_ + _) / 24.0).as("mean24"))
    // seasonal index per calendar month (two-year mean − grand mean)
    val withSeas = withMean.select(col("*") +:
      (1 to 12).map { j =>
        ((c(199900 + j) + c(200000 + j)) / 2.0 - col("mean24")).as(s"s$j")
      }: _*)
    val withD = withSeas.select(col("*") +:
      (1 to 6).map(j => (c(200100 + j) - col(s"s$j")).as(s"d$j")): _*)
    // Holt fold, unrolled: l←αd+(1−α)(l+b), b←β(l'−l)+(1−β)b
    var f = withD.select(col("*"), col("d1").as("l1"),
      (col("d2") - col("d1")).as("b1"))
    (2 to 6).foreach { t =>
      val l0 = col(s"l${t - 1}"); val b0 = col(s"b${t - 1}")
      val lNew = lit(0.5) * col(s"d$t") + lit(0.5) * (l0 + b0)
      f = f.select(col("*"), lNew.as(s"l$t"))
        .select(col("*"),
          (lit(0.25) * (col(s"l$t") - l0) + lit(0.75) * b0).as(s"b$t"))
    }
    f
  }

  /** shared SQL scaffold mirroring [[atRiskTable]]. */
  private[ops] val sqlAtRisk: String =
    """cust AS (SELECT o_custkey,
      |    min(o_orderdate::date) AS f, max(o_orderdate::date) AS l
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(o_orderdate::date) AS maxd FROM orders),
      |life AS (SELECT date_diff('day', f, l) AS t,
      |    CASE WHEN date_diff('day', l, maxd) > 90 THEN 1 ELSE 0 END AS ev
      |  FROM cust CROSS JOIN mx),
      |grain AS (SELECT t, cast(sum(ev) AS bigint) AS d,
      |    cast(count(*) - sum(ev) AS bigint) AS c,
      |    cast(count(*) AS bigint) AS cnt
      |  FROM life GROUP BY t),
      |tot AS (SELECT cast(count(*) AS bigint) AS n FROM life),
      |ar AS (SELECT t, d, c, cnt,
      |    n - (sum(cnt) OVER (ORDER BY t) - cnt) AS n_at_risk
      |  FROM grain CROSS JOIN tot)""".stripMargin

  val queries: Map[String, Q] = Map(
    // Kaplan-Meier survival curve over customer lifetimes: duration =
    // days between a customer's first and last order; churn event if the
    // last order is > 90 days before the dataset's end (else censored —
    // still active). Classic KM: at each distinct duration t,
    // n_at_risk = customers with duration ≥ t, d = churn events at t,
    // S(t) = Π_{t'≤t} (1 − d/n). Scale shape: one customer-grain agg
    // (map-side combine), a duration-grain agg (≤ a few thousand rows),
    // then BOTH cumulatives — the at-risk countdown and the log-survival
    // sum — ride the distributed prefix-sum kernel, never a single-task
    // window over the fact. Cross-engine exactness: counts are integers;
    // the survival product is a cumsum of ln factors quantized
    // DECIMAL(18,12) before summing (the LM-surprisal discipline), one
    // exp + round(6) at emit. A step where every at-risk customer churns
    // (factor 0) is handled exactly: the ln term is nulled out and a
    // cumulative zero-flag pins survival to 0.0 from that t on.
    "survival_kaplan_meier" -> { (s, dir) =>
      val ar = atRiskTable(s, dir)
      // log-survival cumsum + the all-churn zero flag, one shared spine
      val terms = ar.select(lit(0L).as("__p"), col("t"),
        log(nullif(col("n_at_risk") - col("d"), lit(0L)).cast(DoubleType) /
          col("n_at_risk").cast(DoubleType)).cast(DecimalType(18, 12))
          .as("term"),
        when(col("d") === col("n_at_risk"), 1L).otherwise(0L).as("zflag"))
      val cum2 = GraftOps.distributedRunningSums(terms, "__p", "t",
        Seq("term" -> "ln_s", "zflag" -> "zsum"))
      ar.join(cum2.select("t", "ln_s", "zsum"), "t")
        .select(col("t"), col("n_at_risk"), col("d").as("n_events"),
          col("c").as("n_censored"),
          when(col("zsum") > 0L, lit(0.0))
            .otherwise(round(exp(col("ln_s").cast(DoubleType)), 6))
            .as("survival"))
        .orderBy("t")
    },

    // Holt-Winters-style seasonal forecast baseline: additive seasonal
    // indices from two full years of exact-decimal monthly revenue
    // (1999+2000), then a Holt (level+trend) fold over the deseasonalized
    // first half of 2001 with α=1/2, β=1/4 — EXACT binary fractions, so
    // the entire unrolled fold is one fixed IEEE tree over dsum-exact
    // inputs and the 3-month-horizon forecasts are bit-equal raw doubles
    // (no rounding needed). Scale shape: ONE map-side conditional
    // aggregate produces all 30 monthly sums (30 output fields — far
    // under the codegen.maxFields cliff); everything after is a 1-row
    // projection + explode. At 100 TB the scan dominates and is fully
    // parallel; there is no shuffle beyond the 1-row aggregate.
    "forecast_holt_winters" -> { (s, dir) =>
      val f = holtFrame(s, dir)
      val fc = (1 to 3).map { h =>
        struct(lit(h.toLong).as("h"), lit(200106 + h).as("ym"),
          (col("l6") + lit(h.toDouble) * col("b6") + col(s"s${6 + h}"))
            .as("forecast"))
      }
      f.select(explode(array(fc: _*)).as("r"))
        .select(col("r.h").as("h"), col("r.ym").as("ym"),
          col("r.forecast").as("forecast"))
        .orderBy("h")
    },

    // label-propagation community detection over the strong co-purchase
    // graph: init label = node id; each of 4 rounds every node adopts
    // its neighbors' MOST FREQUENT label (ties → smallest label — total,
    // deterministic). Per round: one equi-join edge⋈labels + two hash
    // aggregates (count, then min_by argmax) — the dedup_cluster_cc
    // per-round shape, lineage truncated per round. Output: the 25
    // largest communities. Integer-only end to end.
    "graph_label_propagation" -> { (s, dir) =>
      val e = Graph.strongEdgesCached(s, dir)
      val adj = e.select(col("pa").as("node"), col("pb").as("nbr"))
        .unionAll(e.select(col("pb").as("node"), col("pa").as("nbr")))
        // r15 (guide §2.4): pre-partition + sort by the per-round join
        // key BEFORE the checkpoint (partitioning/ordering survive it),
        // so each of the 4 rounds re-shuffles/sorts only the node-sized
        // labels side, never the edge list
        .repartition(col("nbr"))
        .sortWithinPartitions("nbr")
        .localCheckpoint(false) // feeds one join per round
      var labels = adj.select(col("node")).distinct()
        .select(col("node"), col("node").as("label"))
        .localCheckpoint(false)
      for (_ <- 1 to 4) {
        labels = adj
          .join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
          .groupBy(col("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("node"))
          .agg(min_by(col("label"),
            struct((-col("cnt")).as("nc"), col("label"))).as("label"))
          .localCheckpoint(false)
      }
      labels.groupBy("label").agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("label"))
        .limit(25)
        .select(col("label").as("community"), col("n_members"))
    },

    // mergeable quantile sketch (the KLL slot, deterministic variant):
    // fixed-universe equi-width histogram — per-shard bucket counts are
    // exact integers that merge by ADDITION (the property that makes the
    // sketch 100 TB-shardable: every executor sketches its split, the
    // merge is a tiny hash agg), quantile estimates read off the merged
    // cumulative histogram with guaranteed ≤ one-bucket-width error. The
    // query IS the contract: build 32 shard sketches → merge → estimate
    // p25/p50/p75/p95/p99 → compare each against the EXACT
    // percentile_disc and emit the within-bucket check. Bucket math is
    // floor(x / width) with width = 110000/512 (exact binary), so bucket
    // ids, ranks, and edges are bit-deterministic in both engines.
    "profile_quantile_sketch_mergeable" -> { (s, dir) =>
      val width = 214.84375 // 110000 / 512, exact binary fraction
      val x = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice").as("x"))
      // per-shard sketches (the distributed build)…
      val shardSketch = x
        .select((col("l_orderkey") % 32L).as("shard"),
          floor(col("x") / width).cast("long").as("bucket"))
        .groupBy("shard", "bucket").agg(count(lit(1)).as("cnt"))
      // …merged by pure addition (the mergeability contract)
      val merged = shardSketch.groupBy("bucket")
        .agg(sum(col("cnt")).as("cnt"))
      val cum = GraftOps.distributedRunningSum(
        merged.select(lit(0L).as("__p"), col("bucket"), col("cnt")),
        "__p", "bucket", "cnt", "cum")
      val tot = merged.agg(sum(col("cnt")).as("n_total"))
      val qs = Seq(0.25, 0.5, 0.75, 0.95, 0.99)
      // smallest bucket whose cumulative count reaches rank ⌈q·N⌉ — a
      // conditional MIN per q inside the aggregate (a filtered crossJoin
      // would degrade to a conditioned BNLJ; aggregate expressions don't)
      val estAggs = qs.zipWithIndex.map { case (q, i) =>
        min(when(col("cum") >= ceil(lit(q) * col("n_total")), col("bucket")))
          .as(s"b$i")
      }
      val est = cum.crossJoin(broadcast(tot))
        .agg(estAggs.head, estAggs.tail: _*)
        .crossJoin(broadcast(tot))
      // exact discrete percentiles (1 row, broadcast back)
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") +
        "_" + seq.incrementAndGet()
      val v = s"graft_qsketch_$tag"
      x.select("x").createOrReplaceTempView(v)
      val exact =
        try s.sql(qs.zipWithIndex.map { case (q, i) =>
          s"percentile_disc($q) WITHIN GROUP (ORDER BY x) AS e$i"
        }.mkString("SELECT ", ", ", s" FROM $v"))
        finally s.catalog.dropTempView(v)
      val rows = qs.zipWithIndex.map { case (q, i) =>
        struct(lit(q).as("q"), col("n_total"),
          col(s"b$i").as("bucket"),
          (col(s"b$i").cast(DoubleType) * width).as("est_lo"),
          ((col(s"b$i") + 1L).cast(DoubleType) * width).as("est_hi"),
          col(s"e$i").as("exact_disc"))
      }
      est.crossJoin(broadcast(exact))
        .select(explode(array(rows: _*)).as("r"))
        .select(col("r.q").as("q"), col("r.n_total").as("n_total"),
          col("r.bucket").as("bucket"), col("r.est_lo").as("est_lo"),
          col("r.est_hi").as("est_hi"), col("r.exact_disc").as("exact_disc"),
          (col("r.exact_disc") >= col("r.est_lo") &&
            col("r.exact_disc") < col("r.est_hi")).as("within_bucket"))
        .orderBy("q")
    }
  )

  /** DuckDB mirror of the Holt fold — generated by the same index loops
    * (not the same STRINGS: each engine computes its sums from data; only
    * the fold's shape is shared, and HoltSpec pins the Spark fold against
    * hand-computed values). */
  /** the shared CTE chain (o → wide → mean → seasonals → deseason →
    * fold f6) both Holt oracles build on. */
  private[ops] def sqlHoltCtes: String = {
    val sums = (monthsSeasonal ++ monthsFold :+ 200107).map(m =>
      s"coalesce(cast(sum(cast(o_totalprice AS decimal(18,4))) FILTER (WHERE ym = $m) AS double), 0.0) AS m$m")
      .mkString(",\n    ")
    val mean24 = monthsSeasonal.map(m => s"m$m").mkString(" + ")
    val seas = (1 to 12).map(j =>
      s"(m${199900 + j} + m${200000 + j}) / 2.0 - mean24 AS s$j").mkString(",\n  ")
    val des = (1 to 6).map(j => s"m${200100 + j} - s$j AS d$j").mkString(",\n  ")
    val folds = (2 to 6).map { t =>
      val prev = if (t == 2) "d1" else s"l${t - 1}"
      val prevB = if (t == 2) "(d2 - d1)" else s"b${t - 1}"
      s"""f$t AS (SELECT *,
         |  0.5 * d$t + 0.5 * ($prev + $prevB) AS l$t,
         |  0.25 * ((0.5 * d$t + 0.5 * ($prev + $prevB)) - $prev) + 0.75 * $prevB AS b$t
         |  FROM ${if (t == 2) "des" else s"f${t - 1}"})""".stripMargin
    }.mkString(",\n")
    s"""o AS (SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
       |    o_totalprice FROM orders),
       |wide AS (SELECT
       |    $sums
       |  FROM o),
       |m AS (SELECT *, ($mean24) / 24.0 AS mean24 FROM wide),
       |sx AS (SELECT *,
       |  $seas
       |  FROM m),
       |des AS (SELECT *,
       |  $des
       |  FROM sx),
       |$folds""".stripMargin
  }

  private def sqlHolt: String =
    s"""WITH $sqlHoltCtes
       |SELECT h, ym, forecast FROM (
       |  SELECT 1::bigint AS h, 200107 AS ym, l6 + 1.0 * b6 + s7 AS forecast FROM f6
       |  UNION ALL SELECT 2, 200108, l6 + 2.0 * b6 + s8 FROM f6
       |  UNION ALL SELECT 3, 200109, l6 + 3.0 * b6 + s9 FROM f6)
       |ORDER BY h""".stripMargin

  /** label-propagation rounds, unrolled MATERIALIZED CTEs (the k-core
    * discipline — plain CTEs re-inline per reference). */
  private def sqlLabelProp: String = {
    val rounds = (1 to 4).map { r =>
      s"""c$r AS MATERIALIZED (SELECT a.node, l.label, count(*) AS cnt
         |  FROM adj a JOIN l${r - 1} l ON a.nbr = l.node
         |  GROUP BY a.node, l.label),
         |l$r AS MATERIALIZED (SELECT node, label FROM (
         |  SELECT node, label,
         |    row_number() OVER (PARTITION BY node ORDER BY cnt DESC, label) AS rn
         |  FROM c$r) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT l_orderkey, l_partkey, count(*) OVER (PARTITION BY l_orderkey) AS bsz FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)) WHERE bsz <= 64),
       |edges AS MATERIALIZED (
       |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM items a JOIN items b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |adj AS MATERIALIZED (SELECT pa AS node, pb AS nbr FROM edges
       |  UNION ALL SELECT pb, pa FROM edges),
       |l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM adj),
       |$rounds
       |SELECT label AS community, cast(count(*) AS bigint) AS n_members
       |FROM l4 GROUP BY label
       |ORDER BY n_members DESC, community LIMIT 25""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "survival_kaplan_meier" ->
      s"""WITH $sqlAtRisk,
        |surv AS (SELECT t, d, c, n_at_risk,
        |    sum(cast(ln(cast(nullif(n_at_risk - d, 0) AS double)
        |          / cast(n_at_risk AS double)) AS decimal(18,12)))
        |      OVER (ORDER BY t) AS ln_s,
        |    sum(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t) AS zsum
        |  FROM ar)
        |SELECT t, cast(n_at_risk AS bigint) AS n_at_risk, d AS n_events,
        |  c AS n_censored,
        |  CASE WHEN zsum > 0 THEN 0.0
        |       ELSE round(exp(cast(ln_s AS double)), 6) END AS survival
        |FROM surv ORDER BY t""".stripMargin,
    "forecast_holt_winters" -> sqlHolt,
    "graph_label_propagation" -> sqlLabelProp,
    "profile_quantile_sketch_mergeable" ->
      """WITH x AS (SELECT l_orderkey, l_extendedprice AS x FROM lineitem),
        |shard AS (SELECT l_orderkey % 32 AS shard,
        |    cast(floor(x / 214.84375) AS bigint) AS bucket,
        |    cast(count(*) AS bigint) AS cnt
        |  FROM x GROUP BY 1, 2),
        |merged AS (SELECT bucket, cast(sum(cnt) AS bigint) AS cnt
        |  FROM shard GROUP BY bucket),
        |cum AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket) AS cum
        |  FROM merged),
        |tot AS (SELECT cast(sum(cnt) AS bigint) AS n_total FROM merged),
        |est AS (SELECT
        |    min(CASE WHEN cum >= ceil(0.25 * n_total) THEN bucket END) AS b0,
        |    min(CASE WHEN cum >= ceil(0.5 * n_total) THEN bucket END) AS b1,
        |    min(CASE WHEN cum >= ceil(0.75 * n_total) THEN bucket END) AS b2,
        |    min(CASE WHEN cum >= ceil(0.95 * n_total) THEN bucket END) AS b3,
        |    min(CASE WHEN cum >= ceil(0.99 * n_total) THEN bucket END) AS b4
        |  FROM cum CROSS JOIN tot),
        |ex AS (SELECT
        |    quantile_disc(x, 0.25) AS e0, quantile_disc(x, 0.5) AS e1,
        |    quantile_disc(x, 0.75) AS e2, quantile_disc(x, 0.95) AS e3,
        |    quantile_disc(x, 0.99) AS e4
        |  FROM x),
        |rows_ AS (
        |  SELECT cast(0.25 AS double) AS q, b0 AS bucket, e0 AS exact_disc
        |    FROM est CROSS JOIN ex
        |  UNION ALL SELECT cast(0.5 AS double), b1, e1 FROM est CROSS JOIN ex
        |  UNION ALL SELECT cast(0.75 AS double), b2, e2 FROM est CROSS JOIN ex
        |  UNION ALL SELECT cast(0.95 AS double), b3, e3 FROM est CROSS JOIN ex
        |  UNION ALL SELECT cast(0.99 AS double), b4, e4 FROM est CROSS JOIN ex)
        |SELECT q, n_total, bucket,
        |  cast(bucket AS double) * 214.84375 AS est_lo,
        |  cast(bucket + 1 AS double) * 214.84375 AS est_hi,
        |  exact_disc,
        |  (exact_disc >= cast(bucket AS double) * 214.84375 AND
        |   exact_disc < cast(bucket + 1 AS double) * 214.84375) AS within_bucket
        |FROM rows_ CROSS JOIN tot ORDER BY q""".stripMargin
  )
}
