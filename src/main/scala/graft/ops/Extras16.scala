package graft.ops

import graft._
import graft.Tables.dec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-8 fifth-session batch 13: chunk-level shared-content dedup
  * (the CDC payoff), a deterministic permutation test, the 2-D joint
  * histogram, and the corpus quality funnel.
  *
  * Scale discipline: chunk dedup is (chunk-hash) equi-join territory —
  * map-side signatures, distinct (asset, hash) sets, shared-count
  * aggregate; the permutation test reuses the Poisson-bootstrap shape
  * (per-(row, replicate) arithmetic assignment, one partial-aggregated
  * 32-group shuffle — never B passes); the histogram and funnel are
  * dimension-sized after one aggregate each.
  *
  * Float discipline: chunk hashes and permutation assignments are pure
  * integers; group means divide exact decimal sums; the extremeness
  * comparison |diff_b| ≥ |diff_obs| compares doubles both engines
  * computed identically, and the flag is a PROJECTION over the
  * broadcast observed row (a filter would condition the BNLJ).
  */
object Extras16 {

  val queries: Map[String, Q] = Map(

    // rsync/backup-style shared-content detection: assets (sampled doc
    // + its trailing-byte-trimmed re-encode) are signed per CDC chunk
    // ([[graft.functions.CdcChunkHashes]] — same boundaries as
    // text_cdc_chunking), then pairs sharing ≥ 2 distinct chunk hashes
    // surface. Re-encodes share every chunk but the trailing one by
    // construction; template twins surface too.
    "multimodal_cdc_dedup" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      def hashes(c: org.apache.spark.sql.Column) = ColumnBridge.column(
        graft.functions.CdcChunkHashes(ColumnBridge.expression(c)))
      val docs = Tables(s, dir, "documents")
        .where(col("doc_id") % 5 === 0).select(col("doc_id"), col("text"))
      val assets = docs.select((col("doc_id") * 2).as("asset_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .unionByName(docs.select((col("doc_id") * 2 + 1).as("asset_id"),
          encode(expr("substring(text, 1, length(text) - 1)"), "UTF-8")
            .as("payload")))
      val sigs = assets
        .select(col("asset_id"), explode(hashes(col("payload"))).as("h"))
        .distinct()
      val a = sigs.select(col("asset_id").as("asset_a"), col("h"))
      val b = sigs.select(col("asset_id").as("asset_b"), col("h"))
      a.join(b, "h").where(col("asset_a") < col("asset_b"))
        .groupBy("asset_a", "asset_b")
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 2)
        .orderBy("asset_a", "asset_b")
    },

    // permutation test for the urgent-vs-rest mean price difference:
    // 32 deterministic pseudo-permutations (Bernoulli(p̂) surrogate
    // reassignment from key arithmetic — group sizes are preserved in
    // expectation), p = (1 + #extreme) / (B + 1).
    "stats_permutation_test" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("a"))
      val obs = o.agg(count(lit(1)).as("n"), sum(col("a")).as("n_a"),
          sum(when(col("a") === 1L, dec(col("price")))).as("sa"),
          sum(when(col("a") === 0L, dec(col("price")))).as("sb"))
        .select(col("n"), col("n_a"),
          expr("n_a * 1000 DIV n").as("t"),
          ((col("sa").cast(DoubleType) / col("n_a").cast(DoubleType)) -
            (col("sb").cast(DoubleType) /
              (col("n") - col("n_a")).cast(DoubleType))).as("diff_obs"))
      val perms = o.select(col("k"), col("price"),
          explode(sequence(lit(1L), lit(32L))).as("b"))
        .crossJoin(broadcast(obs.select(col("t"))))
        .withColumn("pa",
          when(((col("k") * 31L + col("b")) * 2654435761L) % 1000L < col("t"),
            1L).otherwise(0L))
        .groupBy("b")
        .agg(sum(col("pa")).as("na"), count(lit(1)).as("nn"),
          sum(when(col("pa") === 1L, dec(col("price")))).as("sa"),
          sum(when(col("pa") === 0L, dec(col("price")))).as("sb"))
        .select(((col("sa").cast(DoubleType) / col("na").cast(DoubleType)) -
          (col("sb").cast(DoubleType) /
            (col("nn") - col("na")).cast(DoubleType))).as("diff_b"))
      val extreme = perms.crossJoin(broadcast(obs.select(col("diff_obs"))))
        .select(when(greatest(col("diff_b"), -col("diff_b")) >=
          greatest(col("diff_obs"), -col("diff_obs")), 1L).otherwise(0L)
          .as("ex"))
        .agg(sum(col("ex")).as("n_extreme"))
      // + 0.0 normalizes IEEE -0.0 on a near-zero observed difference
      obs.select(col("n"), col("n_a"),
        (round(col("diff_obs"), 6) + lit(0.0)).as("diff_obs"))
        .crossJoin(broadcast(extreme))
        .select(col("n"), col("n_a"), col("diff_obs"), col("n_extreme"),
          round((col("n_extreme") + 1L).cast(DoubleType) / 33.0, 6)
            .as("p_value"))
    },

    // joint price × quantity histogram — the 2-D distribution heatmap
    // behind profile_histogram's marginals. Pure integer bins.
    "agg_histogram_2d" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select(
        floor(col("l_extendedprice") / 10000.0).as("price_bin"),
        floor(col("l_quantity") / 10.0).as("qty_bin"))
      val cells = li.groupBy("price_bin", "qty_bin")
        .agg(count(lit(1)).as("n"))
      cells.crossJoin(broadcast(cells.agg(sum(col("n")).as("tot"))))
        .select(col("price_bin"), col("qty_bin"), col("n"),
          round(col("n").cast(DoubleType) / col("tot").cast(DoubleType), 6)
            .as("share"))
        .orderBy("price_bin", "qty_bin")
    },

    // corpus quality funnel: survival through four conjunctive gates
    // (min length → min tokens → exact-dup canonical → top-3
    // languages) — the attrition report every curation pipeline
    // publishes before training.
    "pipeline_quality_funnel" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      val canon = d.groupBy("text").agg(min(col("doc_id")).as("canon_id"))
      val topLangs = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("lang")).limit(3)
        .select(col("lang"), lit(1L).as("is_top"))
      val flags = d.join(canon, "text")
        .join(broadcast(topLangs), Seq("lang"), "left_outer")
        .select(
          when(col("n_chars") >= 200, 1L).otherwise(0L).as("f1"),
          when(size(split(col("text"), " ")) >= 30, 1L).otherwise(0L).as("f2"),
          when(col("doc_id") === col("canon_id"), 1L).otherwise(0L).as("f3"),
          coalesce(col("is_top"), lit(0L)).as("f4"))
      val agg = flags.agg(count(lit(1)).as("n0"), sum(col("f1")).as("n1"),
        sum(col("f1") * col("f2")).as("n2"),
        sum(col("f1") * col("f2") * col("f3")).as("n3"),
        sum(col("f1") * col("f2") * col("f3") * col("f4")).as("n4"))
      agg.select(explode(array(
          struct(lit("0_all").as("stage"), col("n0").as("n_surviving")),
          struct(lit("1_min_length").as("stage"), col("n1").as("n_surviving")),
          struct(lit("2_min_tokens").as("stage"), col("n2").as("n_surviving")),
          struct(lit("3_dedup_canonical").as("stage"),
            col("n3").as("n_surviving")),
          struct(lit("4_top_langs").as("stage"), col("n4").as("n_surviving"))))
          .as("s"), col("n0"))
        .select(col("s.stage").as("stage"),
          col("s.n_surviving").as("n_surviving"),
          round(col("s.n_surviving").cast(DoubleType) /
            col("n0").cast(DoubleType), 6).as("pct_of_start"))
        .orderBy("stage")
    }
  )

  /** DuckDB chunk hash over payload positions s..e (1-based, the
    * StringPolyHash byte fold). */
  private def sqlChunkHash(s: String, e: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(generate_series($s, $e),
       |                 i2 -> ord(substring(payload, i2, 1))::BIGINT)),
       |  (acc, x) -> (acc * 31 + x) % 2147483647)""".stripMargin

  private def horner8: String =
    (1 until 8).foldLeft("cast(ascii(substr(payload, i, 1)) AS bigint)") {
      (acc, k) =>
        s"(($acc) * 256 + ascii(substr(payload, i + $k, 1))) % 2147483647"
    }

  val oracle: Map[String, String] = Map(
    "multimodal_cdc_dedup" ->
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
        |boundaries AS (SELECT asset_id, payload, i + 7 AS p
        |  FROM pos
        |  WHERE i <= length(payload) - 7
        |    AND (($horner8) * 737 + 97) % 2147483647 % 64 = 0),
        |spans AS (
        |  SELECT asset_id, payload,
        |    coalesce(lag(p) OVER (PARTITION BY asset_id ORDER BY p), 0) + 1
        |      AS s, p AS e
        |  FROM boundaries
        |  UNION ALL
        |  SELECT a.asset_id, a.payload, coalesce(max(b.p), 0) + 1,
        |    length(a.payload)
        |  FROM assets a LEFT JOIN boundaries b USING (asset_id)
        |  GROUP BY a.asset_id, a.payload
        |  HAVING length(a.payload) > coalesce(max(b.p), 0)),
        |sigs AS (SELECT DISTINCT asset_id,
        |    ${sqlChunkHash("s", "e")} AS h
        |  FROM spans),
        |pairs AS (SELECT x.asset_id AS asset_a, y.asset_id AS asset_b,
        |    cast(count(*) AS bigint) AS n_shared
        |  FROM sigs x JOIN sigs y ON x.h = y.h AND x.asset_id < y.asset_id
        |  GROUP BY 1, 2)
        |SELECT asset_a, asset_b, n_shared FROM pairs WHERE n_shared >= 2
        |ORDER BY asset_a, asset_b""".stripMargin,
    "stats_permutation_test" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS price,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
        |  FROM orders),
        |obs AS (SELECT cast(count(*) AS bigint) AS n,
        |    cast(sum(a) AS bigint) AS n_a,
        |    (sum(a) * 1000) // count(*) AS t,
        |    cast(sum(CASE WHEN a = 1
        |        THEN cast(price AS decimal(18,4)) END) AS double)
        |      / cast(sum(a) AS double)
        |    - cast(sum(CASE WHEN a = 0
        |        THEN cast(price AS decimal(18,4)) END) AS double)
        |      / cast(count(*) - sum(a) AS double) AS diff_obs
        |  FROM o),
        |perms AS (SELECT b,
        |    cast(sum(CASE WHEN pa = 1
        |        THEN cast(price AS decimal(18,4)) END) AS double)
        |      / cast(sum(pa) AS double)
        |    - cast(sum(CASE WHEN pa = 0
        |        THEN cast(price AS decimal(18,4)) END) AS double)
        |      / cast(count(*) - sum(pa) AS double) AS diff_b
        |  FROM (SELECT price, b,
        |      CASE WHEN ((k * 31 + b) * 2654435761) % 1000 < t
        |        THEN 1 ELSE 0 END AS pa
        |    FROM o CROSS JOIN range(1, 33) r(b) CROSS JOIN obs)
        |  GROUP BY b),
        |ext AS (SELECT cast(sum(CASE WHEN greatest(diff_b, -diff_b)
        |      >= greatest(diff_obs, -diff_obs) THEN 1 ELSE 0 END) AS bigint)
        |    AS n_extreme
        |  FROM perms CROSS JOIN obs)
        |SELECT n, n_a, round(diff_obs, 6) + 0.0 AS diff_obs, n_extreme,
        |  round(cast(n_extreme + 1 AS double) / 33.0, 6) AS p_value
        |FROM obs CROSS JOIN ext""".stripMargin,
    "agg_histogram_2d" ->
      """WITH cells AS (SELECT
        |    cast(floor(l_extendedprice / 10000.0) AS bigint) AS price_bin,
        |    cast(floor(l_quantity / 10.0) AS bigint) AS qty_bin,
        |    cast(count(*) AS bigint) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT cast(sum(n) AS bigint) AS tot FROM cells)
        |SELECT price_bin, qty_bin, n,
        |  round(cast(n AS double) / cast(tot AS double), 6) AS share
        |FROM cells CROSS JOIN t ORDER BY price_bin, qty_bin""".stripMargin,
    "pipeline_quality_funnel" ->
      """WITH d AS (SELECT doc_id, text, lang, n_chars FROM documents),
        |canon AS (SELECT text, min(doc_id) AS canon_id FROM d GROUP BY text),
        |top3 AS (SELECT lang FROM (SELECT lang, count(*) AS cnt FROM d
        |  GROUP BY lang ORDER BY cnt DESC, lang LIMIT 3)),
        |flags AS (SELECT
        |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN length(string_split(text, ' ')) >= 30
        |      THEN 1 ELSE 0 END AS f2,
        |    CASE WHEN doc_id = canon_id THEN 1 ELSE 0 END AS f3,
        |    CASE WHEN lang IN (SELECT lang FROM top3) THEN 1 ELSE 0 END AS f4
        |  FROM d JOIN canon USING (text)),
        |agg AS (SELECT cast(count(*) AS bigint) AS n0,
        |    cast(sum(f1) AS bigint) AS n1,
        |    cast(sum(f1 * f2) AS bigint) AS n2,
        |    cast(sum(f1 * f2 * f3) AS bigint) AS n3,
        |    cast(sum(f1 * f2 * f3 * f4) AS bigint) AS n4
        |  FROM flags)
        |SELECT stage, n_surviving,
        |  round(cast(n_surviving AS double) / cast(n0 AS double), 6)
        |    AS pct_of_start
        |FROM (
        |  SELECT '0_all' AS stage, n0 AS n_surviving, n0 FROM agg
        |  UNION ALL SELECT '1_min_length', n1, n0 FROM agg
        |  UNION ALL SELECT '2_min_tokens', n2, n0 FROM agg
        |  UNION ALL SELECT '3_dedup_canonical', n3, n0 FROM agg
        |  UNION ALL SELECT '4_top_langs', n4, n0 FROM agg)
        |ORDER BY stage""".stripMargin
  )
}
