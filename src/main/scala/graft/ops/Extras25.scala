package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch 22: cross-language vocabulary overlap,
  * price dispersion, DAU/WAU stickiness, and null-indicator
  * correlation.
  *
  * Scale discipline: vocabulary overlap joins DISTINCT (lang, word)
  * sets (vocabulary-sized, not corpus-sized); price dispersion reduces
  * each part to three integer cent sums; WAU membership comes from the
  * 7-offset explode of the (user, day) distinct set — the exact
  * sliding-distinct shape that never holds a distinct sketch per
  * window; the null-phi is one map-side 2×2 contingency pass.
  *
  * Float discipline: Jaccard/stickiness/phi divide exact integers
  * (phi's four-marginal product runs through the Spearman wide-product
  * template); dispersion cv is the √(nΣx² − (Σx)²)/Σx fixed tree over
  * exact cents, ORDERED BY THE ROUNDED value (the PMI rule).
  */
object Extras25 {

  val queries: Map[String, Q] = Map(

    // cross-language vocabulary Jaccard: how much word stock do the
    // corpus languages share? r14 optimization (guide §2.3/§2.4): the
    // old shape ran distinct(lang, word) over the exploded token stream
    // and then a word-keyed vocab⋈vocab self-join — three token-scale
    // exchanges. The language set per word is bounded by |langs|, so ONE
    // groupBy(word).collect_set(lang) pass (map-side partial aggregation
    // shrinks the exchange to the vocabulary) replaces all of them;
    // sizes and pair intersections are then |vocab|-sized arithmetic on
    // the materialized-once word→langs table. Same output bit-for-bit
    // (set membership is identical; ordering unchanged).
    "text_vocab_overlap_langs" -> { (s, dir) =>
      val langSets = Tables(s, dir, "documents")
        .select(col("lang"), explode(split(lower(col("text")), " "))
          .as("word"))
        .where(col("word") =!= "")
        .groupBy("word").agg(collect_set(col("lang")).as("langs"))
        .localCheckpoint(false) // feeds sizes AND the pair expansion
      val sizes = langSets.select(explode(col("langs")).as("lang"))
        .groupBy("lang").agg(count(lit(1)).as("nv"))
      langSets
        .select(explode(col("langs")).as("lang_a"), col("langs"))
        .select(col("lang_a"), explode(col("langs")).as("lang_b"))
        .where(col("lang_a") < col("lang_b"))
        .groupBy("lang_a", "lang_b").agg(count(lit(1)).as("common"))
        .join(broadcast(sizes.select(col("lang").as("lang_a"),
          col("nv").as("na"))), "lang_a")
        .join(broadcast(sizes.select(col("lang").as("lang_b"),
          col("nv").as("nb"))), "lang_b")
        .select(col("lang_a"), col("lang_b"), col("common"),
          round(col("common").cast(DoubleType) /
            (col("na") + col("nb") - col("common")).cast(DoubleType), 6)
            .as("jaccard"))
        .orderBy("lang_a", "lang_b")
    },

    // price-dispersion leaders: parts sold at the most inconsistent
    // prices (cv of line price, >= 5 sales) — the pricing-quality
    // sweep. cv in one fixed tree over exact cents; top-20 ordered by
    // the ROUNDED cv (the PMI ordering rule), part key tiebreak.
    "analytics_price_dispersion" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select(col("l_partkey"),
        floor(col("l_extendedprice") * 100.0).as("qc"))
      li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum(col("qc")).as("sx"),
          sum(col("qc").cast(DecimalType(18, 0)) *
            col("qc").cast(DecimalType(18, 0))).as("sxx"))
        .where(col("n") >= 5)
        // re-narrow sxx before the n·sxx product: (12,0)·(38,0) would
        // exceed width 38; per-part Σq² fits 18 digits comfortably
        .withColumn("cv", round(
          sqrt((col("n").cast(DecimalType(12, 0)) *
            col("sxx").cast(DecimalType(18, 0)) -
            col("sx").cast(DecimalType(18, 0)) *
              col("sx").cast(DecimalType(18, 0))).cast(DoubleType)) /
            col("sx").cast(DoubleType), 6))
        .select(col("l_partkey"), col("n"), col("cv"))
        .orderBy(col("cv").desc, col("l_partkey")).limit(20)
    },

    // DAU/WAU stickiness per day: daily actives over trailing-7-day
    // actives — the growth metric. Exact sliding distinct via the
    // 7-offset explode of (user, day) memberships: each active day
    // contributes the user to seven window anchors, then one distinct
    // per anchor — never a distinct sketch per window.
    "events_dau_wau_stickiness" -> { (s, dir) =>
      val userDay = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
      val dau = userDay.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = userDay
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("anchor"))
        .distinct()
        .groupBy(col("anchor").as("day")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast(DoubleType) / col("wau").cast(DoubleType), 6)
            .as("stickiness"))
        .orderBy("day")
    },

    // null-indicator phi coefficient between the cust and price dirt
    // columns (are the nulls CORRELATED? — profile_null_patterns'
    // single-number summary): one 2×2 contingency pass; the
    // four-marginal denominator runs through the wide-product template.
    "profile_null_phi" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").select(
        when(col("o_orderkey") % 97 === 0, 1L).otherwise(0L).as("a"),
        when(col("o_orderkey") % 83 === 0, 1L).otherwise(0L).as("b"))
      val c = o.agg(count(lit(1)).as("n"),
        sum(when(col("a") === 1L && col("b") === 1L, 1L).otherwise(0L))
          .as("n11"),
        sum(when(col("a") === 1L && col("b") === 0L, 1L).otherwise(0L))
          .as("n10"),
        sum(when(col("a") === 0L && col("b") === 1L, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col("a") === 0L && col("b") === 0L, 1L).otherwise(0L))
          .as("n00"))
      val ds = DecimalType(18, 0)
      val num = (col("n11") * col("n00") - col("n10") * col("n01"))
        .cast(DoubleType)
      val den = sqrt(((col("n11") + col("n10")).cast(ds) *
          (col("n01") + col("n00")).cast(ds)).cast(DoubleType)) *
        sqrt(((col("n11") + col("n01")).cast(ds) *
          (col("n10") + col("n00")).cast(ds)).cast(DoubleType))
      c.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        // + 0.0 normalizes IEEE -0.0 on a near-zero phi
        (round(num / den, 6) + lit(0.0)).as("phi"))
    }
  )

  val oracle: Map[String, String] = Map(
    "text_vocab_overlap_langs" ->
      """WITH vocab AS (SELECT DISTINCT lang,
        |    unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents),
        |v AS (SELECT lang, word FROM vocab WHERE word <> ''),
        |sizes AS (SELECT lang, cast(count(*) AS bigint) AS nv
        |  FROM v GROUP BY lang),
        |p AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
        |    cast(count(*) AS bigint) AS common
        |  FROM v a JOIN v b ON a.word = b.word AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT lang_a, lang_b, common,
        |  round(cast(common AS double)
        |    / cast(sa.nv + sb.nv - common AS double), 6) AS jaccard
        |FROM p JOIN sizes sa ON lang_a = sa.lang
        |JOIN sizes sb ON lang_b = sb.lang
        |ORDER BY lang_a, lang_b""".stripMargin,
    "analytics_price_dispersion" ->
      """WITH g AS (SELECT l_partkey, cast(count(*) AS bigint) AS n,
        |    cast(sum(cast(floor(l_extendedprice * 100.0) AS bigint))
        |      AS bigint) AS sx,
        |    sum(cast(floor(l_extendedprice * 100.0) AS hugeint)
        |      * cast(floor(l_extendedprice * 100.0) AS hugeint)) AS sxx
        |  FROM lineitem GROUP BY l_partkey HAVING count(*) >= 5)
        |SELECT l_partkey, n,
        |  round(sqrt(cast(cast(n AS hugeint) * sxx
        |      - cast(sx AS hugeint) * cast(sx AS hugeint) AS double))
        |    / cast(sx AS double), 6) AS cv
        |FROM g ORDER BY cv DESC, l_partkey LIMIT 20""".stripMargin,
    "events_dau_wau_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, cast(count(*) AS bigint) AS dau
        |  FROM ud GROUP BY day),
        |m AS (SELECT DISTINCT user_id, day + d AS anchor
        |  FROM ud CROSS JOIN range(7) r(d)),
        |wau AS (SELECT anchor AS day, cast(count(*) AS bigint) AS wau
        |  FROM m GROUP BY anchor)
        |SELECT day, dau, wau,
        |  round(cast(dau AS double) / cast(wau AS double), 6) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "profile_null_phi" ->
      """WITH o AS (SELECT
        |    CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN o_orderkey % 83 = 0 THEN 1 ELSE 0 END AS b
        |  FROM orders),
        |c AS (SELECT cast(count(*) AS bigint) AS n,
        |    cast(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
        |      AS bigint) AS n11,
        |    cast(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
        |      AS bigint) AS n10,
        |    cast(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
        |      AS bigint) AS n01,
        |    cast(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
        |      AS bigint) AS n00
        |  FROM o)
        |SELECT n, n11, n10, n01, n00,
        |  round(cast(n11 * n00 - n10 * n01 AS double)
        |    / (sqrt(cast(cast(n11 + n10 AS hugeint)
        |        * cast(n01 + n00 AS hugeint) AS double))
        |      * sqrt(cast(cast(n11 + n01 AS hugeint)
        |        * cast(n10 + n00 AS hugeint) AS double))), 6) + 0.0 AS phi
        |FROM c""".stripMargin
  )
}
