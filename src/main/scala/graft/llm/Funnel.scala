package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end text-cleaning funnel: the dedup stack composed in its
  * production order — exact-duplicate drop, then C4-style line/block
  * dedup, then exact-substring span removal — with the doc/token survival
  * counts after each stage. This is the report a corpus-curation run
  * publishes: how much mass each cleaning stage removed, which is the
  * number mix planning and cost accounting key on. Each stage is the
  * already-gated kernel ([[LineDedup.lineDedup]],
  * [[SubstrDedup.substrDedup]]); exact dedup keys on md5(text) — the
  * bounded-width shuffle key at any document size. */
object Funnel {

  val queries: Map[String, Q] = Map(
    "pipeline_text_cleaning_funnel" -> { (s, dir) =>
      def stageRow(stage: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
          .select(lit(stage).as("stage"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      val raw = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      // r15 note: a shared-scan composition (lazy localCheckpoint of
      // `exact` and `line`, collapsing the executed plan's 3 corpus scans
      // and doubled md5 groupBy to one of each) was tried and REVERTED —
      // interleaved A/B (NEW,OLD,NEW,OLD medians 2.25/2.14/1.70/1.77 s,
      // pooled 2.16 vs 2.01) measured it flat-to-negative: the funnel's
      // cost is the substr 20-gram verdict join, not the corpus scans,
      // and the survivor-set materialization costs what the saved scans
      // return. Re-evaluate only if the corpus/scan share grows.
      // 1. exact dedup: one survivor (min doc_id) per distinct text,
      //    keyed on md5 so the shuffle never carries document bodies
      val exact = raw.groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"))
        .select("doc_id", "text")
      // 2. line/block dedup (8-word blocks, first occurrence corpus-wide);
      //    fully-boilerplate documents (no surviving block) leave the funnel
      val line = LineDedup.lineDedup(exact, 8)
        .where(col("n_kept") > 0)
        .select(col("doc_id"), col("clean_text").as("text"))
      // 3. exact-substring cut (≥ 20-word repeated spans, every occurrence)
      val substr = SubstrDedup.substrDedup(line, 20)
        .where(col("clean_text") =!= "")
        .select(col("doc_id"), col("clean_text").as("text"))
      stageRow("0_raw", raw)
        .unionAll(stageRow("1_exact", exact))
        .unionAll(stageRow("2_line", line))
        .unionAll(stageRow("3_substr", substr))
        .orderBy("stage")
    }
  )

  val oracle: Map[String, String] = Map(
    "pipeline_text_cleaning_funnel" ->
      """WITH raw AS (SELECT doc_id, text FROM documents),
        |ex AS (
        |  SELECT min(doc_id) AS doc_id, min(text) AS text
        |  FROM raw GROUP BY md5(text)),
        |w1 AS (
        |  SELECT ex.doc_id, u.el.i - 1 AS pos, u.el.s AS w
        |  FROM ex, unnest(list_transform(string_split(ex.text, ' '),
        |    (s0, i) -> struct_pack(s := s0, i := i))) AS u(el)),
        |b AS (
        |  SELECT doc_id, pos // 8 AS blk,
        |    string_agg(w, ' ' ORDER BY pos) AS btext
        |  FROM w1 GROUP BY doc_id, pos // 8),
        |fo AS (
        |  SELECT btext, doc_id AS fdoc, blk AS fblk FROM (
        |    SELECT btext, doc_id, blk,
        |      row_number() OVER (PARTITION BY btext ORDER BY doc_id, blk) AS rn
        |    FROM b) WHERE rn = 1),
        |ld AS (
        |  SELECT b.doc_id,
        |    coalesce(string_agg(
        |      CASE WHEN b.doc_id = f.fdoc AND b.blk = f.fblk THEN b.btext END,
        |      ' ' ORDER BY b.blk), '') AS text,
        |    sum(CASE WHEN b.doc_id = f.fdoc AND b.blk = f.fblk
        |      THEN 1 ELSE 0 END) AS n_kept
        |  FROM b JOIN fo f USING (btext) GROUP BY b.doc_id),
        |l2 AS (SELECT doc_id, text FROM ld WHERE n_kept > 0),
        |w2 AS (
        |  SELECT l2.doc_id, u.el.i - 1 AS pos, u.el.s AS w
        |  FROM l2, unnest(list_transform(string_split(l2.text, ' '),
        |    (s0, i) -> struct_pack(s := s0, i := i))) AS u(el)),
        |g AS (
        |  SELECT a.doc_id, a.pos AS p,
        |    md5(string_agg(b2.w, ' ' ORDER BY b2.pos)) AS h
        |  FROM w2 a JOIN w2 b2 ON a.doc_id = b2.doc_id
        |    AND b2.pos BETWEEN a.pos AND a.pos + 19
        |  GROUP BY a.doc_id, a.pos HAVING count(*) = 20),
        |seeds AS (
        |  SELECT doc_id, p FROM (
        |    SELECT doc_id, p, count(*) OVER (PARTITION BY h) AS cnt FROM g)
        |  WHERE cnt >= 2),
        |isl AS (
        |  SELECT doc_id, p,
        |    sum(CASE WHEN pm IS NULL OR p > pm + 20 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p) AS island
        |  FROM (SELECT doc_id, p,
        |      max(p) OVER (PARTITION BY doc_id ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |    FROM seeds)),
        |sp AS (
        |  SELECT doc_id, island, min(p) AS st, max(p) + 20 AS en
        |  FROM isl GROUP BY doc_id, island),
        |kw AS (
        |  SELECT w2.doc_id, w2.pos, w2.w, (sp.st IS NULL) AS keep
        |  FROM w2 LEFT JOIN sp ON sp.doc_id = w2.doc_id
        |    AND w2.pos >= sp.st AND w2.pos < sp.en),
        |sd AS (
        |  SELECT doc_id, coalesce(string_agg(CASE WHEN keep THEN w END,
        |    ' ' ORDER BY pos), '') AS text
        |  FROM kw GROUP BY doc_id),
        |s3 AS (SELECT doc_id, text FROM sd WHERE text <> '')
        |SELECT '0_raw' AS stage, cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(len(string_split(text, ' '))) AS bigint) AS n_tokens
        |FROM raw
        |UNION ALL
        |SELECT '1_exact', cast(count(*) AS bigint),
        |  cast(sum(len(string_split(text, ' '))) AS bigint) FROM ex
        |UNION ALL
        |SELECT '2_line', cast(count(*) AS bigint),
        |  cast(sum(len(string_split(text, ' '))) AS bigint) FROM l2
        |UNION ALL
        |SELECT '3_substr', cast(count(*) AS bigint),
        |  cast(sum(len(string_split(text, ' '))) AS bigint) FROM s3
        |ORDER BY stage""".stripMargin
  )
}
