package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring dedup — the published training-data recipe (Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better") that removes
  * EVERY occurrence of any span of ≥ `minWords` consecutive tokens
  * appearing more than once in the corpus. [[LineDedup]] removes repeated
  * FIXED blocks; this removes arbitrary-length repeated spans at arbitrary
  * offsets — the license paragraph pasted mid-document, the boilerplate
  * that starts at word 37 in one page and word 0 in another.
  *
  * Distributed shape (the suffix-array of the single-node recipe does not
  * shard; this is the equi-join formulation that does):
  *  1. SEED: every `minWords`-gram of every document, keyed by its MD5 —
  *     a maximal repeated span of length ≥ minWords is exactly a maximal
  *     run of seed grams each repeated corpus-wide. Gram construction is
  *     the native codegen [[graft.functions.WordNgrams]] (one flat pass);
  *     the shuffle rides (doc_id, pos, 128-bit key) — one bounded-width
  *     row per token position, the same O(tokens) budget as suffix-array
  *     construction, never the gram text itself beyond the map side.
  *  2. DUP: count() window over the gram key — partitions are the
  *     duplicate groups themselves (bounded by the duplication factor,
  *     never corpus-wide), the [[LineDedup]] discipline.
  *  3. EXTEND: per document, overlapping/adjacent duplicated seeds merge
  *     into maximal spans via gaps-islands (one per-doc window over seed
  *     positions only — a few rows per doc).
  *  4. CUT: positions covered by a span are dropped and the survivors
  *     reassembled in order with the deterministic
  *     sort_array(collect_list(struct…)) idiom.
  *
  * Hash discipline: the dedup verdict keys on md5(gram) in BOTH engines
  * (Spark `md5` and DuckDB `md5` agree on UTF-8), so the oracle matches
  * bit-for-bit; at 128 bits collisions are not a correctness concern at
  * any corpus size. */
object SubstrDedup {

  /** PUBLIC API: remove every occurrence of any word span of length ≥
    * `minWords` that occurs ≥ 2 times corpus-wide (including twice within
    * one document). In: (doc_id, text) with single-space-separated words;
    * out: one row per document — (doc_id, n_words, n_spans,
    * n_removed, clean_text), clean_text = '' when the whole document is
    * repeated content. */
  /** Maximal repeated spans per document: (doc_id, st, en) — every word
    * position in [st, en) is inside some `minWords`-gram that occurs ≥ 2
    * times corpus-wide. Shared by the dedup cut and the per-source
    * duplication profile. */
  def repeatedSpans(docs: DataFrame, minWords: Int): DataFrame = {
    require(minWords >= 2, s"minWords must be >= 2, got $minWords")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val grams = ColumnBridge.column(graft.functions.WordNgrams(
      ColumnBridge.expression(split(col("text"), " ")), minWords))
    // one row per token position: (doc_id, p, h) — the corpus-wide seed set
    val seeds = docs
      .select(col("doc_id"), posexplode(grams).as(Seq("p", "g")))
      .select(col("doc_id"), col("p"), md5(col("g")).as("h"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .where(col("cnt") >= 2)
      .select("doc_id", "p")
    // gaps-islands over seed positions: seed intervals [p, p+minWords)
    // merge while p <= previous running end (overlap or exact adjacency)
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    seeds
      .withColumn("pm", max(col("p")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("nw", when(col("pm").isNull
        .or(col("p") > col("pm") + minWords), 1L).otherwise(0L))
      .withColumn("island", sum(col("nw")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("p")).as("st"), (max(col("p")) + minWords).as("en"))
      .select("doc_id", "st", "en")
  }

  def substrDedup(docs: DataFrame, minWords: Int): DataFrame = {
    val spans = repeatedSpans(docs, minWords)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("st"), col("en"))).as("spans"),
        count(lit(1)).as("n_spans"))
    // cut: spans per doc are few (merged, disjoint), so the coverage test
    // is a tiny exists() over the broadcast-grain span array per word
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("keep", col("spans").isNull.or(!exists(col("spans"),
        s => col("pos") >= s("st") && col("pos") < s("en"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        max(coalesce(col("n_spans"), lit(0L))).as("n_spans"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        array_join(transform(array_sort(collect_list(
          when(col("keep"), struct(col("pos"), col("w"))))),
          x => x("w")), " ").as("clean_text"))
  }

  val queries: Map[String, Q] = Map(
    // planted repeated spans: for doc_id % 10 = 0 a synthetic page embeds
    // words 11..50 of the original between two unique filler words — a
    // shared interior span at DIFFERENT offsets in the two documents
    // (offset 10 in the original, offset 1 in the copy), which the
    // fixed-block line dedup cannot align but exact-substring must: both
    // occurrences (original AND copy) are cut, per the published recipe.
    // Docs shorter than 21 words contribute no planted span (the slice
    // is shorter than minWords); they pass through untouched.
    "text_substr_dedup" -> { (s, dir) =>
      val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = base.where(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        concat(
          concat(lit("head"), col("doc_id").cast("string"), lit("x ")),
          array_join(slice(split(col("text"), " "), 11, 40), " "),
          concat(lit(" tail"), col("doc_id").cast("string"), lit("x")))
          .as("text"))
      substrDedup(base.unionByName(copies), 20).orderBy(col("doc_id"))
    },

    // recall eval on the planted spans: every eligible copy (original has
    // ≥ 30 words, so the embedded slice is ≥ 20 words) must have its
    // planted range fully covered by detected spans — recall 1.0 is the
    // CONTRACT (each planted 20-gram occurs in both documents by
    // construction), so any drop means the seed/extension machinery
    // regressed. One summary row: eligible copies, fully-cut count,
    // doc-level recall, planted-token recall.
    "dedup_substr_recall_eval" -> { (s, dir) =>
      val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = base.where(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        concat(
          concat(lit("head"), col("doc_id").cast("string"), lit("x ")),
          array_join(slice(split(col("text"), " "), 11, 40), " "),
          concat(lit(" tail"), col("doc_id").cast("string"), lit("x")))
          .as("text"))
      val spans = repeatedSpans(base.unionByName(copies), 20)
      // planted range inside each copy: positions [1, 1 + slice_len)
      val planted = base.where(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        least(lit(40), greatest(lit(0),
          size(split(col("text"), " ")) - 10)).as("slice_len"))
        .where(col("slice_len") >= 20)
      val cov = planted.join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("slice_len"),
          when(col("st").isNull, 0)
            .otherwise(greatest(lit(0),
              least(col("en"), col("slice_len") + 1) -
                greatest(col("st"), lit(1)))).as("cov"))
        .groupBy("doc_id", "slice_len")
        .agg(sum(col("cov")).as("covered"))
      cov.agg(count(lit(1)).as("n_eligible"),
        sum(when(col("covered") >= col("slice_len"), 1L).otherwise(0L))
          .as("n_fully_cut"),
        round(sum(when(col("covered") >= col("slice_len"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)).cast("double"), 6)
          .as("recall"),
        round(sum(col("covered")).cast("double") /
          sum(col("slice_len")).cast("double"), 6).as("token_recall"))
    }
  )

  val oracle: Map[String, String] = Map(
    // same pipeline in DuckDB: 20-gram strings via a bounded positional
    // self-join (count(*) = 20 drops tail positions, mirroring
    // WordNgrams' exact-length grams), md5 keys, window count >= 2,
    // gaps-islands extension, LEFT JOIN coverage cut (merged spans are
    // disjoint, so each word matches at most one span row).
    "text_substr_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    'head' || cast(doc_id AS varchar) || 'x ' ||
        |    coalesce(array_to_string(string_split(text, ' ')[11:50], ' '), '')
        |    || ' tail' || cast(doc_id AS varchar) || 'x' AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |w AS (
        |  SELECT d.doc_id, u.el.i - 1 AS pos, u.el.s AS w
        |  FROM d, unnest(list_transform(string_split(d.text, ' '),
        |    (s0, i) -> struct_pack(s := s0, i := i))) AS u(el)),
        |g AS (
        |  SELECT a.doc_id, a.pos AS p,
        |    md5(string_agg(b.w, ' ' ORDER BY b.pos)) AS h
        |  FROM w a JOIN w b ON a.doc_id = b.doc_id
        |    AND b.pos BETWEEN a.pos AND a.pos + 19
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
        |spa AS (
        |  SELECT doc_id, cast(count(*) AS bigint) AS n_spans
        |  FROM sp GROUP BY doc_id),
        |kw AS (
        |  SELECT w.doc_id, w.pos, w.w, (sp.st IS NULL) AS keep
        |  FROM w LEFT JOIN sp ON sp.doc_id = w.doc_id
        |    AND w.pos >= sp.st AND w.pos < sp.en)
        |SELECT k.doc_id,
        |  cast(count(*) AS bigint) AS n_words,
        |  cast(coalesce(max(spa.n_spans), 0) AS bigint) AS n_spans,
        |  cast(sum(CASE WHEN k.keep THEN 0 ELSE 1 END) AS bigint)
        |    AS n_removed,
        |  coalesce(string_agg(CASE WHEN k.keep THEN k.w END,
        |    ' ' ORDER BY k.pos), '') AS clean_text
        |FROM kw k LEFT JOIN spa ON k.doc_id = spa.doc_id
        |GROUP BY k.doc_id ORDER BY k.doc_id""".stripMargin,

    "dedup_substr_recall_eval" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    'head' || cast(doc_id AS varchar) || 'x ' ||
        |    coalesce(array_to_string(string_split(text, ' ')[11:50], ' '), '')
        |    || ' tail' || cast(doc_id AS varchar) || 'x' AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |w AS (
        |  SELECT d.doc_id, u.el.i - 1 AS pos, u.el.s AS w
        |  FROM d, unnest(list_transform(string_split(d.text, ' '),
        |    (s0, i) -> struct_pack(s := s0, i := i))) AS u(el)),
        |g AS (
        |  SELECT a.doc_id, a.pos AS p,
        |    md5(string_agg(b.w, ' ' ORDER BY b.pos)) AS h
        |  FROM w a JOIN w b ON a.doc_id = b.doc_id
        |    AND b.pos BETWEEN a.pos AND a.pos + 19
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
        |ple AS (
        |  SELECT * FROM (
        |    SELECT doc_id + 2000000 AS doc_id,
        |      least(40, greatest(0, len(string_split(text, ' ')) - 10))
        |        AS slice_len
        |    FROM documents WHERE doc_id % 10 = 0)
        |  WHERE slice_len >= 20),
        |cov AS (
        |  SELECT ple.doc_id, ple.slice_len,
        |    sum(CASE WHEN sp.st IS NULL THEN 0
        |      ELSE greatest(0, least(sp.en, ple.slice_len + 1)
        |        - greatest(sp.st, 1)) END) AS covered
        |  FROM ple LEFT JOIN sp ON ple.doc_id = sp.doc_id
        |  GROUP BY ple.doc_id, ple.slice_len)
        |SELECT cast(count(*) AS bigint) AS n_eligible,
        |  cast(sum(CASE WHEN covered >= slice_len THEN 1 ELSE 0 END)
        |    AS bigint) AS n_fully_cut,
        |  round(cast(sum(CASE WHEN covered >= slice_len THEN 1 ELSE 0 END)
        |    AS double) / cast(count(*) AS double), 6) AS recall,
        |  round(cast(sum(covered) AS double) /
        |    cast(sum(slice_len) AS double), 6) AS token_recall
        |FROM cov""".stripMargin
  )
}
