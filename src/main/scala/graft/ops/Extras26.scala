package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-9 batch 1: closed-form 2-D PCA, effect sizes, block-local
  * deterministic shuffle, and cross-sectional price elasticity.
  *
  * Scale discipline: PCA and effect sizes are single map-side
  * sufficient-statistics aggregates (the closed 2×2 eigenproblem needs
  * no iteration); the blocked shuffle rides distributedRank (no global
  * single-task window) and its blocks are contiguous runs of the final
  * order — the IO-locality property a 100 TB epoch shuffle needs (a
  * trainer streams whole blocks; the flat LCG shuffle scatters every
  * row); elasticity joins a broadcast part dim onto a part-grain
  * aggregate.
  *
  * Float discipline: every statistic is a fixed IEEE tree over doubles
  * cast from exact decimal/integer sums; lns are round-6 then summed as
  * DECIMAL(18,12) (the zipf rule); sign-indefinite round() emitters
  * carry + 0.0 (SURVEY §5 signed-zero rule).
  */
object Extras26 {

  private val splitTs = "1998-01-01"

  val queries: Map[String, Q] = Map(

    // pairwise Jensen-Shannon divergence between the unigram word
    // distributions of every source pair — the corpus-comparison matrix
    // a mixture designer reads before setting sampling weights. The
    // corpus collapses to a (source, word) count grid (vocab × sources
    // — dimension-sized), densified so absent words contribute their
    // full p·ln2 mass; JS terms are quantized DECIMAL(18,12) per
    // (pair, word) row (identical trees both engines) and summed
    // exactly. + 0.0: a near-identical pair's quantized sum can land at
    // −1e−12 and round to DuckDB's −0.0 (SURVEY §5).
    "text_js_divergence_sources" -> { (s, dir) =>
      val words = Tables(s, dir, "documents")
        .select(col("source"), explode(split(lower(col("text")), " ")).as("word"))
        .where(col("word") =!= "")
      val counts = words.groupBy("source", "word").agg(count(lit(1)).as("c"))
      val totals = counts.groupBy("source").agg(sum(col("c")).as("n"))
      val vocab = counts.select("word").distinct()
      val grid = totals.crossJoin(vocab)
        .join(counts, Seq("source", "word"), "left")
        .select(col("source"), col("word"),
          (coalesce(col("c"), lit(0L)).cast(DoubleType) /
            col("n").cast(DoubleType)).as("p"))
      val a = grid.select(col("source").as("src_a"), col("word"), col("p").as("pa"))
      val b = grid.select(col("source").as("src_b"), col("word"), col("p").as("pb"))
      def term(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
        when(p === 0.0, lit(0.0))
          .otherwise(p * log(lit(2.0) * p / (p + q)))
      a.join(b, "word").where(col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          ((term(col("pa"), col("pb")) + term(col("pb"), col("pa"))) / 2.0)
            .cast(DecimalType(18, 12)).as("t"))
        .groupBy("src_a", "src_b")
        .agg((round(sum(col("t")).cast(DoubleType), 6) + lit(0.0)).as("js"))
        .orderBy("src_a", "src_b")
    },

    // customer spend-quartile migration across the 1998 boundary: each
    // customer's total spend per half ranks into quartiles (Q1..Q4 via
    // the distributed ntile — never a single-task window); customers
    // active in only one half land in segment 0. The 5×5 transition
    // matrix is the churn/upsell readout of an RFM program.
    "analytics_customer_migration" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").select(col("o_custkey"),
        (col("o_orderdate") < lit(splitTs).cast("timestamp")).as("early"),
        // floor(x·100): the engine-identical double→cents quantization
        floor(col("o_totalprice") * 100.0).cast("long").as("cents"))
      // r14 rework (guide §2.4): the two halves used to rank through two
      // independent distributedNtile kernels (2 range exchanges + 2
      // window passes over two separately-shuffled spend rollups). One
      // groupBy(custkey, half) rollup + ONE [[GraftOps.distributedNtileBy]]
      // pass partitioned on the half flag ranks both halves — identical
      // per-half order, tiebreaks and bucket rule, so seg_from/seg_to are
      // unchanged value for value. The ntile output feeds both the from-
      // and to- branches: checkpoint it once.
      val spend = o.groupBy(col("early"), col("o_custkey"))
        .agg(sum(col("cents")).as("spend"))
        .select("early", "spend", "o_custkey")
      val q = GraftOps.distributedNtileBy(
          spend, "early", Seq("spend", "o_custkey"), 4, "q")
        .localCheckpoint(false)
      val from = q.where(col("early"))
        .select(col("o_custkey"), col("q").cast("long").as("seg_from"))
      val to = q.where(!col("early"))
        .select(col("o_custkey"), col("q").cast("long").as("seg_to"))
      from.join(to, Seq("o_custkey"), "full_outer")
        .select(coalesce(col("seg_from"), lit(0L)).as("seg_from"),
          coalesce(col("seg_to"), lit(0L)).as("seg_to"))
        .groupBy("seg_from", "seg_to")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("seg_from", "seg_to")
    },

    // closed-form 2-D PCA of (quantity, extendedprice): sample
    // covariance eigenvalues λ = (vx+vy)/2 ± √(((vx−vy)/2)² + cxy²),
    // explained-variance ratio, and the unit first principal axis
    // (cxy, λ1−vx)/‖·‖ — the dimensionality/feature diagnostic, one
    // aggregate pass, everything downstream on a single row.
    "profile_pca_2d" -> { (s, dir) =>
      // exact integer-cents sufficient statistics (the spearman wide-
      // product template): Σy² ≈ 6e19 at sf0.1 exceeds 2⁵³, where a
      // decimal→double cast of the SUM is off by an ulp between engines
      // and the n·Σ − (Σ)² cancellation amplifies it into lam1's last
      // digits. Products stay long per row, sums go DECIMAL(28→38,0)
      // (DuckDB: hugeint), and only the exact DIFFERENCES cast to
      // double (correctly rounded in both engines).
      val l = Tables(s, dir, "lineitem").select(
        floor(col("l_quantity") * 100.0).cast("long").as("x"),
        floor(col("l_extendedprice") * 100.0).cast("long").as("y"))
      val dc = DecimalType(28, 0)
      val g = l.agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dc)).as("sx"),
        sum(col("y").cast(dc)).as("sy"),
        sum((col("x") * col("x")).cast(dc)).as("sxx"),
        sum((col("y") * col("y")).cast(dc)).as("syy"),
        sum((col("x") * col("y")).cast(dc)).as("sxy"))
      val nDec = col("n").cast(DecimalType(12, 0))
      val nD = col("n").cast(DoubleType)
      // cent² → dollar² rescale rides the (n(n−1)) divisor
      val denom = nD * (nD - lit(1.0)) * 10000.0
      val vx = (nDec * col("sxx") - col("sx") * col("sx"))
        .cast(DoubleType) / denom
      val vy = (nDec * col("syy") - col("sy") * col("sy"))
        .cast(DoubleType) / denom
      val cxy = (nDec * col("sxy") - col("sx") * col("sy"))
        .cast(DoubleType) / denom
      val r = sqrt(((vx - vy) / 2.0) * ((vx - vy) / 2.0) + cxy * cxy)
      val lam1 = (vx + vy) / 2.0 + r
      val lam2 = (vx + vy) / 2.0 - r
      val ex = lam1 - vx
      val norm = sqrt(cxy * cxy + ex * ex)
      g.select(col("n"), lam1.as("lam1"), lam2.as("lam2"),
        round(lam1 / (vx + vy), 6).as("explained_ratio"),
        (round(cxy / nullif(norm, lit(0.0)), 6) + lit(0.0)).as("pc1_x"),
        (round(ex / nullif(norm, lit(0.0)), 6) + lit(0.0)).as("pc1_y"))
    },

    // effect sizes for the Welch pair (AUTOMOBILE vs BUILDING acctbal):
    // Cohen's d over the pooled sd and the small-sample Hedges g —
    // the "is the difference MEANINGFUL" companion to stats_ttest_welch
    // (same sufficient statistics, same round-4 variance fence).
    "stats_effect_size" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .where(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .select(col("c_mktsegment").as("seg"),
          col("c_acctbal").cast(DecimalType(12, 2)).as("x"))
      val g = c.groupBy("seg").agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("x") * col("x")).cast(DoubleType).as("sxx"))
      val m = col("sx") / col("n")
      val v = round((col("sxx") - col("sx") * col("sx") / col("n"))
        / (col("n") - 1), 4)
      val a = g.where(col("seg") === "AUTOMOBILE")
        .select(col("n").as("n1"), m.as("m1"), v.as("v1"))
      val b = g.where(col("seg") === "BUILDING")
        .select(col("n").as("n2"), m.as("m2"), v.as("v2"))
      val sp = sqrt(((col("n1") - 1L).cast(DoubleType) * col("v1") +
        (col("n2") - 1L).cast(DoubleType) * col("v2")) /
        (col("n1") + col("n2") - 2L).cast(DoubleType))
      val d = (col("m1") - col("m2")) / sp
      val gH = d * (lit(1.0) -
        lit(3.0) / (lit(4.0) * (col("n1") + col("n2")).cast(DoubleType) - 9.0))
      a.crossJoin(broadcast(b))
        .select(col("n1"), col("n2"),
          (round(d, 6) + lit(0.0)).as("cohens_d"),
          (round(gH, 6) + lit(0.0)).as("hedges_g"))
    },

    // two-level deterministic epoch shuffle: docs scatter across 16
    // blocks by one LCG, blocks are permuted, docs shuffle WITHIN their
    // block by a second LCG — each block is a contiguous run of the
    // final order (the trainer streams whole blocks sequentially; the
    // flat per-row shuffle destroys IO locality at 100 TB). Global
    // position via distributedRank — never a single-task window.
    "pipeline_shuffle_blocked" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"),
          (((col("doc_id") % 99991L) * 40692L + 7L) % 16L).as("block"))
        .withColumn("bpos", (col("block") * 31L + 17L) % 16L)
        .withColumn("wkey",
          ((col("doc_id") % 100003L) * 48271L + 11L) % 99991L)
      GraftOps.distributedRank(d, Seq("bpos", "wkey", "doc_id"), "pos")
        .select(col("doc_id"), col("block"), col("pos"))
        .orderBy("doc_id")
    },

    // corpus snapshot diff — the data-ops gate before swapping a
    // training corpus version: v2 derives from v1 by deterministic
    // removals (÷17), text revisions (÷13), and additions (÷19 under an
    // id offset); a full-outer join on the id classifies every doc as
    // added / removed / changed (content hash differs) / unchanged and
    // the per-(status, lang) census is the review artifact. One
    // id-keyed shuffle; hashes are map-side.
    "pipeline_dataset_diff" -> { (s, dir) =>
      val v1 = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val v2 = v1.where(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" revised")))
            .otherwise(col("text")).as("text"),
          col("lang"))
        .unionByName(v1.where(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
            col("lang")))
      val a = v1.select(col("doc_id"), md5(col("text").cast("binary")).as("h1"),
        col("lang").as("lang1"))
      val b = v2.select(col("doc_id"), md5(col("text").cast("binary")).as("h2"),
        col("lang").as("lang2"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(
          when(col("h1").isNull, lit("added"))
            .when(col("h2").isNull, lit("removed"))
            .when(col("h1") =!= col("h2"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"),
          coalesce(col("lang1"), col("lang2")).as("lang"))
        .groupBy("status", "lang")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("status", "lang")
    },

    // point-in-time-correct feature extraction: for every purchase
    // event, the user's trailing activity counters STRICTLY BEFORE the
    // event (clicks in the last hour, events and quantized value sum in
    // the last day) — the leakage-free feature-engineering shape (a
    // frame that included the current row would leak the label). RANGE
    // frames on the microsecond axis, partitioned per user (bounded
    // partitions); value quantized floor(v·1e6) so the window sums stay
    // exact integers in both engines.
    "events_feature_asof" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"),
        floor(col("value") * 1000000.0).cast("long").as("vq"))
      val w1h = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, -1L)
      val w24 = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-86400000000L, -1L)
      e.withColumn("clicks_1h",
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w1h))
        .withColumn("events_24h", count(lit(1)).over(w24))
        .withColumn("vsum_24h_q", sum(col("vq")).over(w24))
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"),
          coalesce(col("clicks_1h"), lit(0L)).as("clicks_1h"),
          col("events_24h"),
          coalesce(col("vsum_24h_q"), lit(0L)).as("vsum_24h_q"))
        .orderBy("event_id")
    },

    // cross-sectional price elasticity per part type: ln(total qty) ~
    // ln(retail price) OLS across the parts of each type — slope =
    // elasticity (how demand falls as price rises within a category).
    // Part-grain exact-decimal quantity rollup, broadcast dim join,
    // round-6 lns summed as DECIMAL(18,12) (zipf rule), closed-form OLS.
    "analytics_price_elasticity" -> { (s, dir) =>
      val qty = Tables(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(col("l_quantity").cast(DecimalType(12, 2)))
          .cast(DoubleType).as("qty"))
      val pts = qty
        .join(broadcast(Tables(s, dir, "part")
          .select(col("p_partkey"), col("p_type"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .where(col("qty") > 0.0)
        .select(col("p_type"),
          round(log(col("p_retailprice")), 6).as("x"),
          round(log(col("qty")), 6).as("y"))
      val g = pts.groupBy("p_type").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(18, 12))).cast(DoubleType).as("sx"),
        sum(col("y").cast(DecimalType(18, 12))).cast(DoubleType).as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(18, 12)))
          .cast(DoubleType).as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(18, 12)))
          .cast(DoubleType).as("syy"),
        sum((col("x") * col("y")).cast(DecimalType(18, 12)))
          .cast(DoubleType).as("sxy"))
      val nD = col("n").cast(DoubleType)
      val covN = nD * col("sxy") - col("sx") * col("sy")
      val varXN = nD * col("sxx") - col("sx") * col("sx")
      val varYN = nD * col("syy") - col("sy") * col("sy")
      g.where(col("n") >= 3)
        .select(col("p_type"), col("n").as("n_parts"),
          (round(covN / varXN, 6) + lit(0.0)).as("elasticity"),
          round(covN * covN / (varXN * varYN), 6).as("r2"))
        .orderBy("p_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "text_js_divergence_sources" ->
      """WITH w AS (SELECT source,
        |    unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents),
        |counts AS (SELECT source, word, cast(count(*) AS bigint) AS c
        |  FROM w WHERE word <> '' GROUP BY source, word),
        |totals AS (SELECT source, cast(sum(c) AS bigint) AS n
        |  FROM counts GROUP BY source),
        |vocab AS (SELECT DISTINCT word FROM counts),
        |grid AS (SELECT t.source, v.word,
        |    cast(coalesce(c.c, 0) AS double) / cast(t.n AS double) AS p
        |  FROM totals t CROSS JOIN vocab v
        |  LEFT JOIN counts c ON c.source = t.source AND c.word = v.word),
        |pairs AS (SELECT a.source AS src_a, b.source AS src_b,
        |    cast(((CASE WHEN a.p = 0.0 THEN 0.0
        |           ELSE a.p * ln(2.0 * a.p / (a.p + b.p)) END)
        |        + (CASE WHEN b.p = 0.0 THEN 0.0
        |           ELSE b.p * ln(2.0 * b.p / (b.p + a.p)) END)) / 2.0
        |      AS decimal(18,12)) AS t
        |  FROM grid a JOIN grid b ON a.word = b.word AND a.source < b.source)
        |SELECT src_a, src_b,
        |  round(cast(sum(t) AS double), 6) + 0.0 AS js
        |FROM pairs GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,
    "pipeline_dataset_diff" ->
      """WITH v1 AS (SELECT doc_id, text, lang FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' revised' ELSE text END
        |      AS text, lang
        |  FROM v1 WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, lang FROM v1 WHERE doc_id % 19 = 0),
        |a AS (SELECT doc_id, md5(text) AS h1, lang AS lang1 FROM v1),
        |b AS (SELECT doc_id, md5(text) AS h2, lang AS lang2 FROM v2),
        |j AS (SELECT
        |    CASE WHEN h1 IS NULL THEN 'added'
        |         WHEN h2 IS NULL THEN 'removed'
        |         WHEN h1 <> h2 THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    coalesce(lang1, lang2) AS lang
        |  FROM a FULL OUTER JOIN b USING (doc_id))
        |SELECT status, lang, cast(count(*) AS bigint) AS n_docs
        |FROM j GROUP BY status, lang ORDER BY status, lang""".stripMargin,
    "events_feature_asof" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
        |    cast(floor(value * 1000000.0) AS bigint) AS vq
        |  FROM events),
        |f AS (SELECT event_id, user_id, us, event_type,
        |    cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER w1 AS bigint) AS c1,
        |    cast(count(*) OVER w24 AS bigint) AS e24,
        |    cast(sum(vq) OVER w24 AS bigint) AS v24
        |  FROM e
        |  WINDOW w1 AS (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING),
        |  w24 AS (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, us,
        |  coalesce(c1, 0) AS clicks_1h, coalesce(e24, 0) AS events_24h,
        |  coalesce(v24, 0) AS vsum_24h_q
        |FROM f WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "analytics_customer_migration" ->
      """WITH o AS (SELECT o_custkey,
        |    o_orderdate < TIMESTAMP '1998-01-01' AS early,
        |    cast(floor(o_totalprice * 100.0) AS bigint) AS cents
        |  FROM orders),
        |f AS (SELECT o_custkey, ntile(4) OVER (ORDER BY spend, o_custkey)
        |      AS seg_from
        |  FROM (SELECT o_custkey, cast(sum(cents) AS bigint) AS spend
        |        FROM o WHERE early GROUP BY o_custkey)),
        |t AS (SELECT o_custkey, ntile(4) OVER (ORDER BY spend, o_custkey)
        |      AS seg_to
        |  FROM (SELECT o_custkey, cast(sum(cents) AS bigint) AS spend
        |        FROM o WHERE NOT early GROUP BY o_custkey))
        |SELECT cast(coalesce(seg_from, 0) AS bigint) AS seg_from,
        |  cast(coalesce(seg_to, 0) AS bigint) AS seg_to,
        |  cast(count(*) AS bigint) AS n_customers
        |FROM f FULL OUTER JOIN t USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY seg_from, seg_to""".stripMargin,
    "profile_pca_2d" ->
      """WITH l AS (SELECT cast(floor(l_quantity * 100.0) AS bigint) AS x,
        |                  cast(floor(l_extendedprice * 100.0) AS bigint) AS y
        |           FROM lineitem),
        |g AS (SELECT cast(count(*) AS bigint) AS n,
        |             cast(sum(x) AS hugeint) AS sx,
        |             cast(sum(y) AS hugeint) AS sy,
        |             cast(sum(x * x) AS hugeint) AS sxx,
        |             cast(sum(y * y) AS hugeint) AS syy,
        |             cast(sum(x * y) AS hugeint) AS sxy
        |      FROM l),
        |c AS (SELECT n,
        |    cast(cast(n AS hugeint) * sxx - sx * sx AS double)
        |      / (cast(n AS double) * (cast(n AS double) - 1.0) * 10000.0) AS vx,
        |    cast(cast(n AS hugeint) * syy - sy * sy AS double)
        |      / (cast(n AS double) * (cast(n AS double) - 1.0) * 10000.0) AS vy,
        |    cast(cast(n AS hugeint) * sxy - sx * sy AS double)
        |      / (cast(n AS double) * (cast(n AS double) - 1.0) * 10000.0) AS cxy
        |  FROM g),
        |e AS (SELECT n, vx, vy, cxy,
        |    sqrt(((vx - vy) / 2.0) * ((vx - vy) / 2.0) + cxy * cxy) AS r
        |  FROM c)
        |SELECT n,
        |  (vx + vy) / 2.0 + r AS lam1,
        |  (vx + vy) / 2.0 - r AS lam2,
        |  round(((vx + vy) / 2.0 + r) / (vx + vy), 6) AS explained_ratio,
        |  round(cxy / nullif(sqrt(cxy * cxy
        |      + ((vx + vy) / 2.0 + r - vx) * ((vx + vy) / 2.0 + r - vx)), 0),
        |    6) + 0.0 AS pc1_x,
        |  round(((vx + vy) / 2.0 + r - vx) / nullif(sqrt(cxy * cxy
        |      + ((vx + vy) / 2.0 + r - vx) * ((vx + vy) / 2.0 + r - vx)), 0),
        |    6) + 0.0 AS pc1_y
        |FROM e""".stripMargin,
    "stats_effect_size" ->
      """WITH c AS (SELECT c_mktsegment AS seg,
        |                  cast(c_acctbal AS decimal(12,2)) AS x
        |           FROM customer
        |           WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')),
        |g AS (SELECT seg, cast(count(*) AS bigint) AS n,
        |             cast(sum(x) AS double) AS sx,
        |             cast(sum(x * x) AS double) AS sxx
        |      FROM c GROUP BY seg),
        |a AS (SELECT n AS n1, sx / n AS m1,
        |             round((sxx - sx * sx / n) / (n - 1), 4) AS v1
        |      FROM g WHERE seg = 'AUTOMOBILE'),
        |b AS (SELECT n AS n2, sx / n AS m2,
        |             round((sxx - sx * sx / n) / (n - 1), 4) AS v2
        |      FROM g WHERE seg = 'BUILDING')
        |SELECT n1, n2,
        |  round((m1 - m2) / sqrt((cast(n1 - 1 AS double) * v1
        |      + cast(n2 - 1 AS double) * v2)
        |    / cast(n1 + n2 - 2 AS double)), 6) + 0.0 AS cohens_d,
        |  round(((m1 - m2) / sqrt((cast(n1 - 1 AS double) * v1
        |      + cast(n2 - 1 AS double) * v2)
        |    / cast(n1 + n2 - 2 AS double)))
        |    * (1.0 - 3.0 / (4.0 * cast(n1 + n2 AS double) - 9.0)), 6)
        |    + 0.0 AS hedges_g
        |FROM a CROSS JOIN b""".stripMargin,
    "pipeline_shuffle_blocked" ->
      """WITH d AS (SELECT doc_id,
        |    ((doc_id % 99991) * 40692 + 7) % 16 AS block
        |  FROM documents),
        |k AS (SELECT doc_id, block,
        |    (block * 31 + 17) % 16 AS bpos,
        |    ((doc_id % 100003) * 48271 + 11) % 99991 AS wkey
        |  FROM d)
        |SELECT doc_id, block,
        |  cast(row_number() OVER (ORDER BY bpos, wkey, doc_id) AS bigint)
        |    AS pos
        |FROM k ORDER BY doc_id""".stripMargin,
    "analytics_price_elasticity" ->
      """WITH q AS (SELECT l_partkey,
        |    cast(sum(cast(l_quantity AS decimal(12,2))) AS double) AS qty
        |  FROM lineitem GROUP BY l_partkey),
        |pts AS (SELECT p_type,
        |    round(ln(p_retailprice), 6) AS x,
        |    round(ln(qty), 6) AS y
        |  FROM q JOIN part ON l_partkey = p_partkey WHERE qty > 0),
        |g AS (SELECT p_type, cast(count(*) AS bigint) AS n,
        |    cast(sum(cast(x AS decimal(18,12))) AS double) AS sx,
        |    cast(sum(cast(y AS decimal(18,12))) AS double) AS sy,
        |    cast(sum(cast(x * x AS decimal(18,12))) AS double) AS sxx,
        |    cast(sum(cast(y * y AS decimal(18,12))) AS double) AS syy,
        |    cast(sum(cast(x * y AS decimal(18,12))) AS double) AS sxy
        |  FROM pts GROUP BY p_type)
        |SELECT p_type, n AS n_parts,
        |  round((cast(n AS double) * sxy - sx * sy)
        |    / (cast(n AS double) * sxx - sx * sx), 6) + 0.0 AS elasticity,
        |  round((cast(n AS double) * sxy - sx * sy)
        |      * (cast(n AS double) * sxy - sx * sy)
        |    / ((cast(n AS double) * sxx - sx * sx)
        |      * (cast(n AS double) * syy - sy * sy)), 6) AS r2
        |FROM g WHERE n >= 3 ORDER BY p_type""".stripMargin
  )
}
