package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 11 batch 4: the group-composable form of the rank sketch (the
  * production shape — one sketch per partition key, mergeable across
  * shards by construction) and the windowed key-skew monitor (the
  * streaming-shaped twin of profile_key_concentration). */
object Extras38 {

  val queries: Map[String, Q] = Map(

    // per-group rank-adaptive quantile sketch: the Extras36 sketch keyed
    // by event_type — every (group, shard) keeps its order statistics,
    // merge is a per-group union, the cumulative readout rides ONE
    // prefix-sum kernel call partitioned by group. Contract columns per
    // (group, q): estimate vs exact percentile_disc, target vs achieved
    // rank, deterministic bound Σk + max k, verdict.
    "profile_quantile_sketch_rank_by_group" -> { (s, dir) =>
      val S = 32
      val budget = 256
      val x = Tables(s, dir, "events")
        .select(col("event_type").as("g"), (col("value") * 1e6).as("x"),
          col("event_id"))
      val sharded = x.select(col("g"), (col("event_id") % S).as("shard"),
        col("x"))
      val ns = sharded.groupBy("g", "shard").agg(count(lit(1)).as("ns"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g", "shard").orderBy("x")
      val samples = sharded
        .withColumn("rn", row_number().over(w))
        .join(broadcast(ns.withColumn("k",
          greatest(lit(1L), floor(col("ns") / budget.toDouble)))),
          Seq("g", "shard"))
        .where(col("rn") % col("k") === 0)
        .select(col("g"), col("shard"), col("x"), col("k").as("w"))
      val cum = GraftOps.distributedRunningSum(
        samples.select(col("g").as("__p"), col("x"), col("w")),
        "__p", "x", "w", "cumw")
      val tot = x.groupBy("g").agg(count(lit(1)).as("n_total"))
      val kst = samples.select("g", "shard", "w").distinct()
        .groupBy("g").agg((sum(col("w")) + max(col("w"))).as("rank_bound"))
      val nsamp = samples.groupBy("g").agg(count(lit(1)).as("n_samples"))
      val qs = Seq(0.5, 0.95)
      val est = cum.withColumnRenamed("__p", "g").join(broadcast(tot), "g")
        .groupBy("g")
        // coalesce fallback: budget 256 leaves only ~8× margin at q=0.95
        // (deficit ≈ N/256 per group); if the retained weight falls short
        // of ceil(q·N) the max retained sample is the right readout, not
        // NULL (same deterministic rank bound applies)
        .agg(qs.zipWithIndex.map { case (q, i) =>
          coalesce(min(when(col("cumw") >= ceil(lit(q) * col("n_total")),
            col("x"))), max(col("x"))).as(s"est$i")
        }.head, qs.zipWithIndex.tail.map { case (q, i) =>
          coalesce(min(when(col("cumw") >= ceil(lit(q) * col("n_total")),
            col("x"))), max(col("x"))).as(s"est$i")
        }: _*)
      val ranks = x.join(broadcast(est), "g")
        .groupBy("g")
        .agg(qs.indices.map(i =>
          sum(when(col("x") <= col(s"est$i"), 1L).otherwise(0L))
            .as(s"rank$i")).head,
          qs.indices.tail.map(i =>
            sum(when(col("x") <= col(s"est$i"), 1L).otherwise(0L))
              .as(s"rank$i")): _*)
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_qrg"
      val v = s"graft_qrankg_$tag"
      x.createOrReplaceTempView(v)
      val exact =
        try s.sql(("SELECT g" +: qs.zipWithIndex.map { case (q, i) =>
          s"percentile_disc($q) WITHIN GROUP (ORDER BY x) AS e$i"
        }).mkString("", ", ", s" FROM $v GROUP BY g"))
        finally s.catalog.dropTempView(v)
      val rows = qs.zipWithIndex.map { case (q, i) =>
        struct(lit(q).as("q"), col("n_total"), col("n_samples"),
          col(s"est$i").as("est"), col(s"e$i").as("exact_disc"),
          ceil(lit(q) * col("n_total")).cast(LongType).as("target_rank"),
          col(s"rank$i").as("est_rank"), col("rank_bound"))
      }
      est.join(tot, "g").join(nsamp, "g").join(kst, "g")
        .join(ranks, "g").join(exact, "g")
        .select(col("g"), explode(array(rows: _*)).as("r"))
        .select(col("g").as("event_type"), col("r.q").as("q"),
          col("r.n_total").as("n_total"), col("r.n_samples").as("n_samples"),
          col("r.est").as("est"), col("r.exact_disc").as("exact_disc"),
          col("r.target_rank").as("target_rank"),
          col("r.est_rank").as("est_rank"),
          col("r.rank_bound").cast(LongType).as("rank_bound"),
          (abs(col("r.est_rank") - col("r.target_rank")) <=
            col("r.rank_bound")).as("within_bound"))
        .orderBy("event_type", "q")
    },

    // hourly key-skew monitor: per 1 h tumbling window, the hottest
    // user's event share and the effective user count — the streaming-
    // shaped twin of profile_key_concentration (per-window state is one
    // (user, count) map — bounded by window span, the monitor a pipeline
    // alerts on BEFORE a hot key reaches the batch joins). Two hash
    // aggregates; integer sums; one IEEE division per stat.
    "stream_key_skew_monitor" -> { (s, dir) =>
      val uw = Tables(s, dir, "events")
        .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("ws"),
          col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      uw.groupBy("ws")
        .agg(count(lit(1)).as("n_users"),
          sum(col("cnt")).as("n_events"),
          max(col("cnt")).as("max_cnt"),
          (max(col("cnt")).cast(DoubleType) /
            sum(col("cnt")).cast(DoubleType)).as("top_share"),
          ((sum(col("cnt")).cast(DoubleType) * sum(col("cnt")).cast(DoubleType)) /
            sum(col("cnt").cast(DecimalType(38, 0)) * col("cnt"))
              .cast(DoubleType)).as("eff_users"))
        .orderBy("ws")
    }
  )

  val oracle: Map[String, String] = Map(
    "profile_quantile_sketch_rank_by_group" -> {
      val qs = Seq(0.5, 0.95)
      val ests = qs.zipWithIndex.map { case (q, i) =>
        s"coalesce(min(CASE WHEN cumw >= ceil(cast($q AS double) * n_total) THEN x END), max(x)) AS est$i"
      }.mkString(", ")
      val exacts = qs.zipWithIndex.map { case (q, i) =>
        s"quantile_disc(x, cast($q AS double)) AS e$i"
      }.mkString(", ")
      val rks = qs.indices.map(i =>
        s"cast(sum(CASE WHEN x.x <= est.est$i THEN 1 ELSE 0 END) AS bigint) AS rank$i")
        .mkString(", ")
      val outRows = qs.zipWithIndex.map { case (q, i) =>
        s"""SELECT est.g AS event_type, cast($q AS double) AS q, n_total,
           |  n_samples, est$i AS est, e$i AS exact_disc,
           |  cast(ceil(cast($q AS double) * n_total) AS bigint) AS target_rank,
           |  rank$i AS est_rank, cast(rank_bound AS bigint) AS rank_bound,
           |  abs(rank$i - cast(ceil(cast($q AS double) * n_total) AS bigint))
           |    <= rank_bound AS within_bound
           |FROM est JOIN tot ON est.g = tot.g
           |  JOIN nsamp ON est.g = nsamp.g JOIN kst ON est.g = kst.g
           |  JOIN ranks ON est.g = ranks.g JOIN exact ON est.g = exact.g""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH x AS (SELECT event_type AS g, value * 1000000.0 AS x, event_id
         |  FROM events),
         |sh AS (SELECT g, event_id % 32 AS shard, x FROM x),
         |ns AS (SELECT g, shard, count(*) AS ns FROM sh GROUP BY g, shard),
         |kk AS (SELECT g, shard,
         |    greatest(1, cast(floor(ns / 256.0) AS bigint)) AS k FROM ns),
         |r AS (SELECT g, shard, x,
         |    row_number() OVER (PARTITION BY g, shard ORDER BY x) AS rn
         |  FROM sh),
         |samp AS (SELECT r.g, r.shard, r.x, kk.k AS w
         |  FROM r JOIN kk ON r.g = kk.g AND r.shard = kk.shard
         |  WHERE r.rn % kk.k = 0),
         |cum AS (SELECT g, x, sum(w) OVER (PARTITION BY g ORDER BY x
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
         |  FROM samp),
         |tot AS (SELECT g, cast(count(*) AS bigint) AS n_total
         |  FROM sh GROUP BY g),
         |nsamp AS (SELECT g, cast(count(*) AS bigint) AS n_samples
         |  FROM samp GROUP BY g),
         |kst AS (SELECT g, sum(k) + max(k) AS rank_bound FROM (
         |  SELECT DISTINCT g, shard, w AS k FROM samp) GROUP BY g),
         |est AS (SELECT cum.g, $ests FROM cum JOIN tot ON cum.g = tot.g
         |  GROUP BY cum.g),
         |exact AS (SELECT g, $exacts FROM x GROUP BY g),
         |ranks AS (SELECT x.g, $rks FROM x JOIN est ON x.g = est.g
         |  GROUP BY x.g)
         |$outRows
         |ORDER BY event_type, q""".stripMargin
    },
    "stream_key_skew_monitor" ->
      """WITH uw AS (
        |  SELECT cast(epoch(date_trunc('hour', cast(ts AS timestamp)))
        |      AS bigint) AS ws, user_id,
        |    cast(count(*) AS bigint) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT ws, cast(count(*) AS bigint) AS n_users,
        |  cast(sum(cnt) AS bigint) AS n_events,
        |  cast(max(cnt) AS bigint) AS max_cnt,
        |  cast(max(cnt) AS double) / cast(sum(cnt) AS double) AS top_share,
        |  (cast(sum(cnt) AS double) * cast(sum(cnt) AS double)) /
        |    cast(sum(cast(cnt AS hugeint) * cnt) AS double) AS eff_users
        |FROM uw GROUP BY ws ORDER BY ws""".stripMargin
  )
}
