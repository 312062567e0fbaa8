package graft.ops

import graft._
import graft.Tables.dec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch 10: the corpus dataset card, shipping-
  * delay SLAs, warehouse MERGE semantics, and the Poisson bootstrap.
  *
  * Scale discipline: the dataset card is pure one-pass aggregates
  * assembled by broadcast (projection-only crossJoins — filters would
  * condition the BNLJ); MERGE resolves through ONE full-outer equi-join
  * on the key (each side pre-aggregated to key grain); the bootstrap is
  * the POISSON form — per-(row, replicate) weights are computed
  * map-side from arithmetic on the row key, so B resamples cost one
  * explode + one partial-aggregated shuffle instead of B passes (the
  * only bootstrap that exists at 100 TB).
  *
  * Float discipline: money through DECIMAL(18,4) sums; day deltas and
  * bootstrap weights are pure integers; every ratio/CI tree is a fixed
  * IEEE expression over identical inputs, rounded at 6; the 32
  * replicate means fold through decimal(24,12) terms (the entropy
  * rule, widened: squared deviations of 1.5e5-scale means overflow
  * (18,12)'s six integer digits) so the cross-replicate sums are
  * partition-order-proof.
  */
object Extras13 {

  private val mergeInsertOffset = 1000000000L

  val queries: Map[String, Q] = Map(

    // dataset card: the one-row corpus summary an LLM data release
    // ships — sizes, language/source spread, duplication, length
    // profile, dominant language and its share.
    "pipeline_dataset_card" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val base = d.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("text")).as("n_distinct_texts"))
      val topLang = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
        .agg(max(struct(col("cnt"), col("lang"))).as("m"))
        .select(col("m.lang").as("top_lang"), col("m.cnt").as("top_lang_docs"))
      base.crossJoin(broadcast(topLang))
        .select(col("n_docs"), col("n_langs"), col("n_sources"),
          col("total_chars"),
          (col("total_chars").cast(DoubleType) /
            col("n_docs").cast(DoubleType)).as("mean_chars"),
          round(lit(1.0) - col("n_distinct_texts").cast(DoubleType) /
            col("n_docs").cast(DoubleType), 6).as("dup_ratio"),
          col("top_lang"),
          round(col("top_lang_docs").cast(DoubleType) /
            col("n_docs").cast(DoubleType), 6).as("top_lang_share"))
    },

    // order-to-ship delay SLAs per priority: integral day deltas
    // through the percentile == quantile_cont [T] bridge.
    "analytics_shipping_delay" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("order_d"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("ship_d"), col("order_d")).cast("long").as("delay_d"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (sum(col("delay_d")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("mean_delay_d"),
          round(expr("percentile(delay_d, 0.5)"), 4).as("p50_d"),
          round(expr("percentile(delay_d, 0.9)"), 4).as("p90_d"),
          max(col("delay_d")).as("max_d"))
        .orderBy("o_orderpriority")
    },

    // warehouse MERGE (upsert + delete in one statement): a
    // deterministic change set against the orders base — keys %21=0
    // DELETE, else %3=0 UPDATE (price·1.1), %11=0 spawn INSERTs under
    // offset keys — applied through ONE full-outer join, summarized by
    // action so the oracle pins every branch of the resolution.
    "upsert_merge_apply" -> { (s, dir) =>
      val base = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val changes = base
        .withColumn("action",
          when(col("k") % 21 === 0, "D")
            .when(col("k") % 3 === 0, "U")
            .when(col("k") % 11 === 0, "I"))
        .where(col("action").isNotNull)
        .select(
          when(col("action") === "I", col("k") + mergeInsertOffset)
            .otherwise(col("k")).as("k"),
          col("action"), (col("price") * 1.1).as("new_price"))
      val resolved = base.join(changes, Seq("k"), "full_outer")
        .select(col("k"),
          when(col("action") === "D", lit("deleted"))
            .when(col("action") === "U", lit("updated"))
            .when(col("action") === "I", lit("inserted"))
            .otherwise(lit("unchanged")).as("outcome"),
          when(col("action") === "D", lit(null).cast(DoubleType))
            .when(col("action").isin("U", "I"), col("new_price"))
            .otherwise(col("price")).as("final_price"))
      resolved.groupBy("outcome")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("final_price"))).cast(DoubleType).as("total_price"))
        .orderBy("outcome")
    },

    // Poisson bootstrap CI for the mean order price: 32 replicates in
    // ONE pass — the per-(row, replicate) weight is a deterministic
    // integer Poisson(1) surrogate from row-key arithmetic (pmf
    // 0.368/0.368/0.184/0.080 for 0..3), so resampling never
    // materializes B copies of the data. Replicate means divide exact
    // long cent sums; the cross-replicate mean/sd fold 32 identical
    // doubles through decimal(24,12) terms.
    "stats_bootstrap_ci" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      // ZERO row expansion (r9): the 32 replicates are 32×2 aggregate
      // columns of ONE global map-side aggregate — the r8
      // explode(sequence(0,31)) form materialized 32× rows into the
      // per-b aggregation; here each replicate's weight is pure row
      // arithmetic and the exchange carries one partial buffer per
      // task. Per replicate: Σw·price as ONE exact decimal sum (64
      // output columns — a 32×4 split blew spark.sql.codegen.maxFields
      // = 100 and dropped the stage out of whole-stage codegen, costing
      // more than the explode) and the weight count. The 1×64 row
      // unpivots to the same 32 (b, m) rows; decimal sums are exact and
      // associative, so m is engine-identical.
      // integer cents via floor(x·100) (price is a STORED double — IEEE
      // multiply + floor is the only double→int quantization that is
      // deterministic AND engine-identical; a plain cast truncates in
      // Spark but rounds in DuckDB): long multiply + long sum stay in
      // vectorized codegen where decimal forms run 128-bit per-row
      // arithmetic — Σw·cents is then exact in both engines
      def u(b: Int): org.apache.spark.sql.Column =
        ((col("k") * 31L + lit(b.toLong)) * 2654435761L) % 1000L
      val cents = floor(col("price") * 100.0).cast("long")
      val aggs = (0 until 32).flatMap { b =>
        val ub = u(b)
        val w = when(ub < 368L, 0L).when(ub < 736L, 1L)
          .when(ub < 920L, 2L).otherwise(3L)
        Seq(sum(cents * w).as(s"sw_$b"), sum(w).as(s"w_$b"))
      }
      // full-sample sufficient stats ride the SAME single aggregate (66
      // output columns, still inside codegen.maxFields); the 1-row
      // result is localCheckpoint'ed so the heavy pass runs exactly once
      // — `reps` feeds both the stats fold and its inner broadcast mean,
      // which otherwise re-executes the aggregate branch.
      val one = o.agg(aggs.head, aggs.tail :+
          sum(dec(col("price"))).as("s_full") :+
          count(lit(1)).as("n_full"): _*)
        .localCheckpoint(false)
      val reps = one
        .select(explode(array((0 until 32).map { b =>
          struct(lit(b.toLong).as("b"),
            (col(s"sw_$b").cast(DoubleType) /
              (col(s"w_$b") * 100L).cast(DoubleType)).as("m"))
        }: _*)).as("r"))
        .select(col("r.b").as("b"), col("r.m").as("m"))
      val full = one.select((col("s_full").cast(DoubleType) /
        col("n_full").cast(DoubleType)).as("full_mean"))
      val stats = reps
        .crossJoin(broadcast(reps.agg(
          (sum(col("m").cast(DecimalType(24, 12))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("boot_mean"))))
        .select(col("boot_mean"),
          ((col("m") - col("boot_mean")) * (col("m") - col("boot_mean")))
            .cast(DecimalType(24, 12)).as("sq"))
        .groupBy("boot_mean")
        .agg(sqrt(sum(col("sq")).cast(DoubleType) /
          (count(lit(1)) - 1L).cast(DoubleType)).as("boot_sd"))
      full.crossJoin(broadcast(stats))
        .select(round(col("full_mean"), 6).as("full_mean"),
          round(col("boot_mean"), 6).as("boot_mean"),
          round(col("boot_sd"), 6).as("boot_sd"),
          round(col("boot_mean") - lit(1.96) * col("boot_sd"), 6).as("ci_lo"),
          round(col("boot_mean") + lit(1.96) * col("boot_sd"), 6).as("ci_hi"))
    }
  )

  val oracle: Map[String, String] = Map(
    "pipeline_dataset_card" ->
      """WITH base AS (SELECT cast(count(*) AS bigint) AS n_docs,
        |    cast(count(DISTINCT lang) AS bigint) AS n_langs,
        |    cast(count(DISTINCT source) AS bigint) AS n_sources,
        |    cast(sum(n_chars) AS bigint) AS total_chars,
        |    cast(count(DISTINCT text) AS bigint) AS n_distinct_texts
        |  FROM documents),
        |tl AS (SELECT max(struct_pack(cnt := cnt, lang := lang)) AS m
        |       FROM (SELECT lang, cast(count(*) AS bigint) AS cnt
        |             FROM documents GROUP BY lang))
        |SELECT n_docs, n_langs, n_sources, total_chars,
        |  cast(total_chars AS double) / cast(n_docs AS double) AS mean_chars,
        |  round(1.0 - cast(n_distinct_texts AS double)
        |    / cast(n_docs AS double), 6) AS dup_ratio,
        |  (m.lang) AS top_lang,
        |  round(cast((m.cnt) AS double) / cast(n_docs AS double), 6)
        |    AS top_lang_share
        |FROM base CROSS JOIN tl""".stripMargin,
    "analytics_shipping_delay" ->
      """WITH j AS (SELECT o_orderpriority,
        |    cast(date_diff('day', cast(o_orderdate AS date),
        |                   cast(l_shipdate AS date)) AS bigint) AS delay_d
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
        |  cast(sum(delay_d) AS double) / cast(count(*) AS double)
        |    AS mean_delay_d,
        |  round(quantile_cont(delay_d, 0.5), 4) AS p50_d,
        |  round(quantile_cont(delay_d, 0.9), 4) AS p90_d,
        |  max(delay_d) AS max_d
        |FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "upsert_merge_apply" ->
      s"""WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price
        |              FROM orders),
        |ch0 AS (SELECT k, price,
        |    CASE WHEN k % 21 = 0 THEN 'D'
        |         WHEN k % 3 = 0 THEN 'U'
        |         WHEN k % 11 = 0 THEN 'I' END AS action
        |  FROM base),
        |changes AS (SELECT
        |    CASE WHEN action = 'I' THEN k + $mergeInsertOffset ELSE k END AS k,
        |    action, price * 1.1 AS new_price
        |  FROM ch0 WHERE action IS NOT NULL),
        |resolved AS (SELECT
        |    CASE WHEN action = 'D' THEN 'deleted'
        |         WHEN action = 'U' THEN 'updated'
        |         WHEN action = 'I' THEN 'inserted'
        |         ELSE 'unchanged' END AS outcome,
        |    CASE WHEN action = 'D' THEN NULL
        |         WHEN action IN ('U', 'I') THEN new_price
        |         ELSE price END AS final_price
        |  FROM base FULL OUTER JOIN changes USING (k))
        |SELECT outcome, cast(count(*) AS bigint) AS n,
        |  cast(sum(cast(final_price AS decimal(18,4))) AS double)
        |    AS total_price
        |FROM resolved GROUP BY outcome ORDER BY outcome""".stripMargin,
    "stats_bootstrap_ci" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS price
        |           FROM orders),
        |full_m AS (SELECT cast(sum(cast(price AS decimal(18,4))) AS double)
        |    / cast(count(*) AS double) AS full_mean FROM o),
        |reps AS (SELECT b,
        |    cast(sum(cast(floor(price * 100.0) AS bigint) * w) AS double)
        |      / cast(sum(w) * 100 AS double) AS m
        |  FROM (SELECT price, b,
        |      CASE WHEN u < 736 THEN 1
        |           WHEN u < 920 THEN 2 ELSE 3 END AS w
        |    FROM (SELECT price, b,
        |        ((k * 31 + b) * 2654435761) % 1000 AS u
        |      FROM o CROSS JOIN range(32) r(b))
        |    WHERE u >= 368)
        |  GROUP BY b),
        |bm AS (SELECT cast(sum(cast(m AS decimal(24,12))) AS double)
        |    / cast(count(*) AS double) AS boot_mean FROM reps),
        |sd AS (SELECT boot_mean,
        |    sqrt(cast(sum(cast((m - boot_mean) * (m - boot_mean)
        |        AS decimal(24,12))) AS double)
        |      / cast(count(*) - 1 AS double)) AS boot_sd
        |  FROM reps CROSS JOIN bm GROUP BY boot_mean)
        |SELECT round(full_mean, 6) AS full_mean,
        |  round(boot_mean, 6) AS boot_mean, round(boot_sd, 6) AS boot_sd,
        |  round(boot_mean - 1.96 * boot_sd, 6) AS ci_lo,
        |  round(boot_mean + 1.96 * boot_sd, 6) AS ci_hi
        |FROM full_m CROSS JOIN sd""".stripMargin
  )
}
