package graft.ops

import graft._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch 7: weighted median, higher-moment
  * profiling (skewness/kurtosis), mutual information, and byte-level
  * phash dedup for binary media payloads.
  *
  * Scale discipline: the weighted median never sorts rows globally — it
  * aggregates to one row per DISTINCT (group, value) and runs the
  * per-group exclusive prefix sum through the distributed two-level
  * kernel; moments reduce map-side to six sufficient statistics per
  * group; MI is dimension-sized after the (lang, source) aggregate; the
  * phash pipeline is one codegen'd map pass per payload + a (chunk,
  * value) equi-join — the dedup_simhash LSH shape on binary columns.
  *
  * Float discipline: weighted median SELECTS a stored value (no
  * interpolation); moments run on floor(x·100) integer cents, with
  * Spark's exact wide-decimal power sums mirrored by DuckDB HUGEINT
  * (the profile_spearman_corr lesson: DuckDB's decimal multiply
  * coerces to a common DECIMAL(18) and overflows int64), and the
  * skew/kurtosis closed forms written as IDENTICAL left-associative
  * IEEE trees in both engines (m2^1.5 as m2·sqrt(m2) — sqrt is
  * correctly rounded, pow is not), rounded at 6; MI follows the
  * profile_entropy discipline (per-term decimal(18,12) cast before the
  * sum, round-6 output).
  */
object Extras10 {

  /** phash gram width: 16-byte grams are doc-specific enough that
    * unrelated same-vocabulary docs land near the random hamming
    * midpoint while re-encodes stay ≤ 3 (see SimHashBytes scaladoc). */
  private val phashWidth = 16

  /** DuckDB mirror of the kernel's base-256 Horner fold over `width`
    * ascii positions starting at i — nested (… · 256 + b) % p. */
  private def sqlByteHorner(width: Int): String =
    (1 until width).foldLeft("cast(ascii(substr(payload, i, 1)) AS bigint)") {
      (acc, k) =>
        s"(($acc) * 256 + ascii(substr(payload, i + $k, 1))) % 2147483647"
    }

  /** PUBLIC API: lower weighted median per group — the smallest value
    * whose inclusive cumulative weight reaches half the total (a
    * STORED value, never an interpolation). One row per DISTINCT
    * (group, value) feeds the per-group exclusive prefix sum through
    * the distributed two-level kernel; never a row-sized sort. Weights
    * must be integral longs. Output: (groupCol, n, total_weight,
    * wmedian). */
  def weightedMedianByGroup(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String): DataFrame = {
    // r14 note: deriving the totals from a localCheckpointed (g, v)
    // pre-aggregate (to save the second fact pass) was tried and
    // REVERTED — the checkpoint materialization of the near-fact-sized
    // distinct table cost far more than the map-side-combined second
    // scan it saved (sweep median 1.85 s → 3.39 s).
    // r15 note: the checkpoint-free variant (pv carries a row count,
    // tot = pv.groupBy(g) over the ReuseExchange'd pv subtree — exact
    // long algebra, identical results) was ALSO tried and REVERTED:
    // interleaved A/B measured 1.94 s → 2.31 s median (both rounds
    // consistent). The wide 4-column kernel input pushes the offsets
    // branch off the reused exchange, and the near-fact-sized pv final
    // aggregate re-runs per consumer branch — more expensive than the
    // map-side-combined second scan it saves. The two-scan shape stays.
    val base = df.select(col(groupCol).as("g"), col(valueCol).as("v"),
      col(weightCol).as("w"))
    val pv = base.groupBy("g", "v").agg(sum(col("w")).as("wv"))
    val cum = GraftOps.distributedRunningSum(pv, "g", "v", "wv", "cw")
    val tot = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("w")).as("total_weight"))
    cum.join(broadcast(tot), "g")
      .where(col("cw") * 2 >= col("total_weight"))
      .groupBy("g", "n", "total_weight")
      .agg(min(col("v")).as("wmedian"))
      .select(col("g").as(groupCol), col("n"), col("total_weight"),
        col("wmedian"))
  }

  val queries: Map[String, Q] = Map(

    // weighted median of extended price, weighted by quantity, per
    // return flag (the [[weightedMedianByGroup]] kernel). Weights
    // enter as floor() bigints (quantities are integral; DuckDB's
    // double→bigint cast rounds where Spark's truncates, floor
    // sidesteps both).
    "agg_weighted_median_by_group" -> { (s, dir) =>
      weightedMedianByGroup(
        Tables(s, dir, "lineitem").select(
          col("l_returnflag").as("g"), col("l_extendedprice").as("v"),
          floor(col("l_quantity")).as("w")),
        "g", "v", "w").orderBy("g")
    },

    // per-group skewness / excess kurtosis over integer cents: six
    // exact sufficient statistics about the integral per-group anchor
    // c = Σq DIV n (bounding every centered power so the decimal
    // ladder (9,0)→(19,0)→(15,0)-recast→(31,0) never overflows width
    // 38), then one fixed IEEE tree per statistic.
    "profile_kurtosis_skew" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        floor(col("l_extendedprice") * 100.0).as("q"))
      val base = li.groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("t"))
        .select(col("g"), col("n"), expr("t DIV n").as("c"))
      val dec9 = DecimalType(9, 0)
      val d = li.join(broadcast(base), "g")
        .withColumn("d", col("q") - col("c"))
        .withColumn("d2", col("d").cast(dec9) * col("d").cast(dec9))
        .withColumn("d2c", col("d2").cast(DecimalType(15, 0)))
      val sums = d.groupBy("g").agg(
        max(col("n")).as("n"), max(col("c")).as("c"),
        sum(col("d")).as("s1"),
        sum(col("d2")).as("s2"),
        sum(col("d2c") * col("d").cast(dec9)).as("s3"),
        sum(col("d2c") * col("d2c")).as("s4"))
      val nD = col("n").cast(DoubleType)
      val s1 = col("s1").cast(DoubleType)
      val s2 = col("s2").cast(DoubleType)
      val s3 = col("s3").cast(DoubleType)
      val s4 = col("s4").cast(DoubleType)
      val delta = s1 / nD
      val m2 = s2 / nD - delta * delta
      val m3 = s3 / nD - lit(3.0) * delta * (s2 / nD) +
        lit(2.0) * delta * delta * delta
      val m4 = s4 / nD - lit(4.0) * delta * (s3 / nD) +
        lit(6.0) * delta * delta * (s2 / nD) -
        lit(3.0) * delta * delta * delta * delta
      sums.select(col("g"), col("n"),
        round((col("c").cast(DoubleType) + delta) / 100.0, 6).as("mean"),
        round(sqrt(m2) / 100.0, 6).as("sd"),
        // + 0.0 normalizes IEEE -0.0 (Spark round drops the sign of a
        // tiny negative; DuckDB round keeps it — one-sign-bit hash split)
        (round(m3 / (m2 * sqrt(m2)), 6) + lit(0.0)).as("skewness"),
        (round(m4 / (m2 * m2) - 3.0, 6) + lit(0.0)).as("kurtosis_excess"))
        .orderBy("g")
    },

    // mutual information between lang and source (are sources
    // language-specialized?) plus both marginal entropies — the
    // dependence measure completing chi² (association strength in
    // nats, zero iff independent). Dimension-sized throughout.
    "profile_mutual_information" -> { (s, dir) =>
      val d = Tables(s, dir, "documents").select(col("lang"), col("source"))
      val nRow = d.agg(count(lit(1)).as("n"))
      def ent(key: String, out: String): DataFrame =
        d.groupBy(key).agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(nRow))
          .select((col("cnt").cast(DoubleType) / col("n").cast(DoubleType))
            .as("p"))
          .agg(round(sum((-col("p") * log(col("p")))
            .cast(DecimalType(18, 12))).cast(DoubleType), 6).as(out))
      val mi = d.groupBy("lang", "source").agg(count(lit(1)).as("nls"))
        .join(broadcast(d.groupBy("lang").agg(count(lit(1)).as("nl"))), "lang")
        .join(broadcast(d.groupBy("source").agg(count(lit(1)).as("ns"))),
          "source")
        .crossJoin(broadcast(nRow))
        .select(((col("nls").cast(DoubleType) / col("n").cast(DoubleType)) *
          log((col("nls").cast(DoubleType) * col("n").cast(DoubleType)) /
            (col("nl").cast(DoubleType) * col("ns").cast(DoubleType))))
          .cast(DecimalType(18, 12)).as("term"))
        .agg((round(sum(col("term")).cast(DoubleType), 6) + lit(0.0)).as("mi"))
      nRow.crossJoin(broadcast(ent("lang", "h_lang")))
        .crossJoin(broadcast(ent("source", "h_source")))
        .crossJoin(broadcast(mi))
    },

    // phash near-dup detection over binary media payloads: each doc
    // ships two "encodings" (full payload, payload minus its last
    // byte — the deterministic stand-in for a re-encode), fingerprinted
    // by the codegen'd byte-level SimHash ([[graft.functions
    // .SimHashBytes]] — locality-sensitive: a small byte edit perturbs
    // only overlapping 4-grams). Candidates share ≥ 1 of 4 8-bit
    // chunks (pigeonhole for hamming ≤ 3), verified by exact
    // bit_count. 8-bit chunks size THIS corpus; at larger corpora the
    // chunk width must grow with log₂(n) to keep buckets sparse (same
    // knob as dedup_simhash — see SCALE.md).
    "multimodal_phash_dedup" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      def ph(c: Column): Column = ColumnBridge.column(
        graft.functions.SimHashBytes(ColumnBridge.expression(c),
          width = phashWidth))
      // deterministic 20% asset library sample: the operator is
      // corpus-size-agnostic; the sample keeps the oracle's exploded
      // per-byte mirror tractable at sf0.1
      val docs = Tables(s, dir, "documents")
        .where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
      val assets = docs.select((col("doc_id") * 2).as("asset_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .unionByName(docs.select((col("doc_id") * 2 + 1).as("asset_id"),
          encode(expr("substring(text, 1, length(text) - 1)"), "UTF-8")
            .as("payload")))
      val sims = assets.select(col("asset_id"), ph(col("payload")).as("ph"))
        .where(col("ph").isNotNull)
      val chunks = sims.select(col("asset_id"), col("ph"),
        explode(array((0 until 4).map(c0 => struct(lit(c0).as("c"),
          shiftright(col("ph"), 8 * c0).bitwiseAND(lit(255L)).as("cval"))): _*))
          .as("ch"))
        .select(col("asset_id"), col("ph"),
          col("ch.c").as("c"), col("ch.cval").as("cval"))
      val ca = chunks.select(col("asset_id").as("asset_a"),
        col("ph").as("pa"), col("c"), col("cval"))
      val cb = chunks.select(col("asset_id").as("asset_b"),
        col("ph").as("pb"), col("c"), col("cval"))
      ca.join(cb, Seq("c", "cval")).where(col("asset_a") < col("asset_b"))
        .groupBy("asset_a", "asset_b")
        .agg(max(col("pa")).as("pa"), max(col("pb")).as("pb"))
        .select(col("asset_a"), col("asset_b"),
          expr("cast(bit_count(pa ^ pb) as bigint)").as("hamming"))
        .where(col("hamming") <= 3)
        .orderBy("asset_a", "asset_b")
    }
  )

  val oracle: Map[String, String] = Map(
    "agg_weighted_median_by_group" ->
      """WITH li AS (SELECT l_returnflag AS g, l_extendedprice AS v,
        |             cast(floor(l_quantity) AS bigint) AS w FROM lineitem),
        |pv AS (SELECT g, v, cast(sum(w) AS bigint) AS wv FROM li GROUP BY g, v),
        |cum AS (SELECT g, v, cast(sum(wv) OVER (PARTITION BY g ORDER BY v
        |          ROWS UNBOUNDED PRECEDING) AS bigint) AS cw
        |        FROM pv),
        |tot AS (SELECT g, cast(count(*) AS bigint) AS n,
        |          cast(sum(w) AS bigint) AS total_weight
        |        FROM li GROUP BY g)
        |SELECT c.g, t.n, t.total_weight, min(c.v) AS wmedian
        |FROM cum c JOIN tot t USING (g)
        |WHERE c.cw * 2 >= t.total_weight
        |GROUP BY c.g, t.n, t.total_weight ORDER BY c.g""".stripMargin,
    "profile_kurtosis_skew" ->
      """WITH li AS (SELECT l_returnflag AS g,
        |             cast(floor(l_extendedprice * 100.0) AS bigint) AS q
        |           FROM lineitem),
        |b AS (SELECT g, cast(count(*) AS bigint) AS n,
        |        cast(sum(q) AS bigint) AS t FROM li GROUP BY g),
        |b2 AS (SELECT g, n, t // n AS c FROM b),
        |d AS (SELECT li.g, n, c, (q - c)::hugeint AS dd
        |      FROM li JOIN b2 USING (g)),
        |agg AS (SELECT g, max(n) AS n, max(c) AS c,
        |    sum(dd) AS s1, sum(dd * dd) AS s2,
        |    sum(dd * dd * dd) AS s3, sum(dd * dd * dd * dd) AS s4
        |  FROM d GROUP BY g)
        |SELECT g, n,
        |  round((cast(c AS double) + cast(s1 AS double) / cast(n AS double))
        |    / 100.0, 6) AS mean,
        |  round(sqrt(cast(s2 AS double) / cast(n AS double)
        |      - (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s1 AS double) / cast(n AS double))) / 100.0, 6) AS sd,
        |  round((cast(s3 AS double) / cast(n AS double)
        |      - 3.0 * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s2 AS double) / cast(n AS double))
        |      + 2.0 * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s1 AS double) / cast(n AS double)))
        |    / ((cast(s2 AS double) / cast(n AS double)
        |        - (cast(s1 AS double) / cast(n AS double))
        |          * (cast(s1 AS double) / cast(n AS double)))
        |      * sqrt(cast(s2 AS double) / cast(n AS double)
        |        - (cast(s1 AS double) / cast(n AS double))
        |          * (cast(s1 AS double) / cast(n AS double)))), 6)
        |    + 0.0 AS skewness,
        |  round((cast(s4 AS double) / cast(n AS double)
        |      - 4.0 * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s3 AS double) / cast(n AS double))
        |      + 6.0 * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s2 AS double) / cast(n AS double))
        |      - 3.0 * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s1 AS double) / cast(n AS double))
        |        * (cast(s1 AS double) / cast(n AS double)))
        |    / ((cast(s2 AS double) / cast(n AS double)
        |        - (cast(s1 AS double) / cast(n AS double))
        |          * (cast(s1 AS double) / cast(n AS double)))
        |      * (cast(s2 AS double) / cast(n AS double)
        |        - (cast(s1 AS double) / cast(n AS double))
        |          * (cast(s1 AS double) / cast(n AS double)))) - 3.0, 6)
        |    + 0.0 AS kurtosis_excess
        |FROM agg ORDER BY g""".stripMargin,
    "profile_mutual_information" ->
      """WITH d AS (SELECT lang, source FROM documents),
        |nn AS (SELECT cast(count(*) AS bigint) AS n FROM d),
        |hl AS (SELECT round(cast(sum(cast(
        |    -(cast(cnt AS double) / cast(n AS double))
        |      * ln(cast(cnt AS double) / cast(n AS double))
        |    AS decimal(18,12))) AS double), 6) AS h_lang
        |  FROM (SELECT lang, cast(count(*) AS bigint) AS cnt FROM d
        |        GROUP BY lang) CROSS JOIN nn),
        |hs AS (SELECT round(cast(sum(cast(
        |    -(cast(cnt AS double) / cast(n AS double))
        |      * ln(cast(cnt AS double) / cast(n AS double))
        |    AS decimal(18,12))) AS double), 6) AS h_source
        |  FROM (SELECT source, cast(count(*) AS bigint) AS cnt FROM d
        |        GROUP BY source) CROSS JOIN nn),
        |mi0 AS (SELECT round(cast(sum(cast(
        |    (cast(nls AS double) / cast(n AS double))
        |      * ln((cast(nls AS double) * cast(n AS double))
        |        / (cast(nl AS double) * cast(ns AS double)))
        |    AS decimal(18,12))) AS double), 6) + 0.0 AS mi
        |  FROM (SELECT lang, source, cast(count(*) AS bigint) AS nls FROM d
        |        GROUP BY lang, source) j
        |  JOIN (SELECT lang, cast(count(*) AS bigint) AS nl FROM d
        |        GROUP BY lang) ml USING (lang)
        |  JOIN (SELECT source, cast(count(*) AS bigint) AS ns FROM d
        |        GROUP BY source) ms USING (source)
        |  CROSS JOIN nn)
        |SELECT n, h_lang, h_source, mi FROM nn, hl, hs, mi0""".stripMargin,
    "multimodal_phash_dedup" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents
        |              WHERE doc_id % 5 = 0),
        |assets AS (
        |  SELECT doc_id * 2 AS asset_id, text AS payload FROM docs
        |  UNION ALL
        |  SELECT doc_id * 2 + 1, substr(text, 1, length(text) - 1)
        |  FROM docs),
        |pos AS (SELECT asset_id, payload,
        |    generate_subscripts(string_split(payload, ''), 1) AS i
        |  FROM assets),
        |grams AS (SELECT asset_id, ${sqlByteHorner(phashWidth)} AS v
        |  FROM pos WHERE i <= length(payload) - ${phashWidth - 1}),
        |bits AS (SELECT asset_id, j,
        |    CASE WHEN 2 * sum(((737 * v + 97) % 2147483647 >> j) & 1)
        |           - count(*) > 0
        |         THEN 1::bigint ELSE 0::bigint END AS sbit
        |  FROM grams CROSS JOIN range(32) r(j) GROUP BY asset_id, j),
        |sims AS (SELECT asset_id, cast(sum(sbit << j) AS bigint) AS ph
        |         FROM bits GROUP BY asset_id),
        |chunks AS (SELECT asset_id, ph, cast(c AS int) AS c,
        |    (ph >> (8 * cast(c AS int))) & 255 AS cval
        |  FROM sims CROSS JOIN range(4) r(c)),
        |p AS (SELECT x.asset_id AS asset_a, y.asset_id AS asset_b,
        |        max(x.ph) AS pa, max(y.ph) AS pb
        |      FROM chunks x JOIN chunks y
        |        ON x.c = y.c AND x.cval = y.cval AND x.asset_id < y.asset_id
        |      GROUP BY 1, 2)
        |SELECT asset_a, asset_b,
        |       cast(bit_count(xor(pa, pb)) AS bigint) AS hamming
        |FROM p WHERE bit_count(xor(pa, pb)) <= 3
        |ORDER BY asset_a, asset_b""".stripMargin
  )
}
