package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.12 text analysis for LLM-pipeline preprocessing: tokenize/TF-IDF/
  * n-grams, language-ID, quality scoring, token counting, rolling-hash
  * fingerprints, lexicon sentiment (EDBT'16 pattern, PAPERS.md).
  *
  * Everything is explode + hash-agg + window — one shuffle per stage, no
  * driver-side loops; at 100 TB the token explode is the big row multiplier
  * and runs map-side before the first shuffle.
  */
object Text {

  /** Shared quality-score core (n_tok, n_stop, score_e6) — ONE definition
    * per engine, consumed by text_quality_score AND
    * pipeline_corpus_curation so the composed pipeline can't drift from
    * the primitive it chains. Integer micro-units via floor division
    * (round(x,6) on k/128-style ratios lands on rounding ties where the
    * engines disagree). */
  private[llm] def qualityScored(df: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    df.withColumn("n_tok", size(toks).cast("long"))
      // stopword count natively: n_tok − |tokens with stopwords removed|
      // (array_remove is a flat collection op; a filter(λ) lambda is the
      // measured interpreted-HOF trap)
      .withColumn("n_stop",
        (col("n_tok") - size(array_remove(array_remove(toks, "the"), "a"))).cast("long"))
      .withColumn("score_e6",
        least(col("n_tok") * 10000L, lit(1000000L)) -
          expr("(n_stop * 1000000 DIV n_tok) DIV 2"))
  }

  /** DuckDB mirror of [[qualityScored]]'s base columns (documents.* +
    * n_tok + n_stop); compose with [[sqlScoreE6]]. */
  private[llm] val sqlQualityBase: String =
    """SELECT doc_id, lang, source, n_chars, text,
      |  cast(len(string_split(lower(text), ' ')) as bigint) AS n_tok,
      |  cast(len(list_filter(string_split(lower(text), ' '),
      |    t -> t IN ('the', 'a'))) as bigint) AS n_stop
      |FROM documents""".stripMargin

  /** DuckDB mirror of the score_e6 expression over the base columns. */
  private[llm] val sqlScoreE6: String =
    "least(n_tok * 10000, 1000000) - (n_stop * 1000000 // n_tok) // 2"

  /** Per-doc term frequencies (doc_id, word, cnt) — the native TokenCounts
    * pass makes this MAP-SIDE (rows are distinct (doc, word) pairs by
    * construction); everything downstream that used exploded occurrences
    * now shuffles ~repetition-factor fewer rows with counts pre-combined. */
  private def termFreqs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    Tables(s, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"), explode(ColumnBridge.column(
        graft.functions.TokenCounts(ColumnBridge.expression(col("toks"))))).as("wc"))
      .select(col("doc_id"), col("wc.word").as("word"), col("wc.cnt").as("cnt"))
  }

  /** Word-bigram ARRAY built without a window: index the token array
    * directly. Zero shuffle — the posexplode+lead formulation costs a full
    * per-doc window sort at 100 TB; this stays map-side.
    *
    * IMPORTANT: `toks` must be a MATERIALIZED column (withColumn), not an
    * inline split(...) expression — an inline expression is re-evaluated
    * for every array element inside the lambda. */
  private[llm] def bigramArray(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.WordNgrams(ColumnBridge.expression(toks), 2))
  }

  val queries: Map[String, Q] = Map(
    "text_tokenize_tf" -> { (s, dir) =>
      termFreqs(s, dir).groupBy(col("word")).agg(sum(col("cnt")).as("tf"))
        .orderBy(col("tf").desc, col("word"))
    },

    // TF-IDF with ln(N/df), top-3 terms per doc
    "text_tfidf_topk" -> { (s, dir) =>
      val tf = termFreqs(s, dir)
      // tf rows are distinct (doc, word) pairs → df is a plain count
      val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      val n = Tables(s, dir, "documents").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("word"))
      // rank on the ROUNDED score: ln() can differ by 1 ulp between the
      // engines' libm, and an unrounded tie at the rank-3 cutoff would
      // flip rows on one side only (same rule as the sim family's cos).
      // dfreq gets NO broadcast hint: it is the full document-frequency
      // vocabulary, which at 100 TB (typos, numbers, ids) outgrows any
      // broadcast limit — AQE's runtime stats broadcast it while it's
      // small and fall back to a shuffle join when it isn't; a hard hint
      // would instead fail the job at the 8 GB broadcast ceiling
      tf.join(dfreq, "word").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("cnt") * log(col("n").cast("double") / col("df")), 6))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("word"), col("tfidf"))
        .orderBy(col("doc_id"), col("rn"))
    },

    // word bigrams, array-native (no window, no extra shuffle)
    "text_ngram" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("toks", split(lower(col("text")), " "))
        .select(explode(bigramArray(col("toks"))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)
    },

    // g_lang/g_source (the GROUPING() bits, int-cast on both engines)
    // disambiguate a grouping-set NULL from a data NULL: without them a
    // real (lang, NULL-source) data group and the lang rollup row carry
    // identical sort keys and the two engines may order them differently
    // — latent while the fixture is null-free, wrong the day it isn't
    "text_lang_source_stats" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupingSets(
          Seq(Seq(col("lang")), Seq(col("lang"), col("source")), Seq()),
          col("lang"), col("source"))
        .agg(grouping(col("lang")).cast("int").as("g_lang"),
          grouping(col("source")).cast("int").as("g_source"),
          count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("g_lang"), col("g_source"),
          asc_nulls_first("lang"), asc_nulls_first("source"))
    },

    // inline lexicon broadcast-joined against the token stream
    "text_sentiment_lexicon" -> { (s, dir) =>
      import s.implicits._
      val lex = Seq(("fast", 2L), ("slow", -2L), ("big", 1L), ("small", -1L))
        .toDF("word", "weight")
      val scores = termFreqs(s, dir).join(broadcast(lex), "word")
        .groupBy(col("doc_id")).agg(sum(col("weight") * col("cnt")).as("score"))
      Tables(s, dir, "documents").select(col("doc_id"))
        .join(scores, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"))
        .orderBy(col("doc_id"))
    },

    // language-ID: per-language top-5 token profile from a labeled train
    // split (doc_id % 10 < 8), prediction = argmax token-set overlap
    "text_langid" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val tf = termFreqs(s, dir)
      val train = tf.join(docs.where(col("doc_id") % 10 < 8)
        .select(col("doc_id"), col("lang")), "doc_id")
      val wProf = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("word"))
      val profile = train.groupBy(col("lang"), col("word"))
        .agg(sum(col("cnt")).as("cnt"))
        .withColumn("prn", row_number().over(wProf))
        .where(col("prn") <= 5)
        .select(col("lang").as("cand_lang"), col("word"))
      // tf rows are already distinct (doc, word) — no global distinct shuffle
      val overlap = tf.select(col("doc_id"), col("word"))
        .join(broadcast(profile), "word")
        .groupBy(col("doc_id"), col("cand_lang"))
        .agg(count(lit(1)).as("hits"))
      // argmax per doc as min_by over (hits DESC, cand_lang ASC) — a
      // map-side-combinable aggregate instead of a per-doc window sort
      val best = overlap.groupBy(col("doc_id"))
        .agg(min_by(struct(col("cand_lang").as("pred_lang"), col("hits")),
          struct((-col("hits")).as("nh"), col("cand_lang"))).as("b"))
        .select(col("doc_id"), col("b.pred_lang").as("pred_lang"),
          col("b.hits").as("hits"))
      docs.select(col("doc_id"), col("lang"))
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("pred_lang"), lit("unknown")).as("pred_lang"),
          coalesce(col("hits"), lit(0L)).as("hits"))
        .orderBy(col("doc_id"))
    },

    // language-ID EVALUATION on the held-out split (doc_id % 10 >= 8):
    // confusion matrix + overall holdout accuracy — the classifier
    // quality certificate next to the dedup/ANN/purity evals. Same
    // train profile and argmax as text_langid.
    "text_langid_eval" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val tf = termFreqs(s, dir)
      val train = tf.join(docs.where(col("doc_id") % 10 < 8)
        .select(col("doc_id"), col("lang")), "doc_id")
      val wProf = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("word"))
      val profile = train.groupBy(col("lang"), col("word"))
        .agg(sum(col("cnt")).as("cnt"))
        .withColumn("prn", row_number().over(wProf))
        .where(col("prn") <= 5)
        .select(col("lang").as("cand_lang"), col("word"))
      val overlap = tf.select(col("doc_id"), col("word"))
        .join(broadcast(profile), "word")
        .groupBy(col("doc_id"), col("cand_lang"))
        .agg(count(lit(1)).as("hits"))
      val best = overlap.groupBy(col("doc_id"))
        .agg(min_by(struct(col("cand_lang").as("pred_lang"), col("hits")),
          struct((-col("hits")).as("nh"), col("cand_lang"))).as("b"))
        .select(col("doc_id"), col("b.pred_lang").as("pred_lang"))
      val test = docs.where(col("doc_id") % 10 >= 8)
        .select(col("doc_id"), col("lang"))
        .join(best, Seq("doc_id"), "left")
        .select(col("lang"),
          coalesce(col("pred_lang"), lit("unknown")).as("pred_lang"))
      val cells = test.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      val acc = cells.agg(
        (sum(when(col("lang") === col("pred_lang"), col("n")).otherwise(0L))
          .cast("double") / sum(col("n")).cast("double")).as("a"))
        .select(round(col("a"), 6).as("test_accuracy"))
      cells.crossJoin(broadcast(acc))
        .select(col("lang"), col("pred_lang"), col("n"), col("test_accuracy"))
        .orderBy("lang", "pred_lang")
    },

    // quality scoring: token stats + stopword ratio → composite score
    // (shared core in [[qualityScored]])
    "text_quality_score" -> { (s, dir) =>
      qualityScored(Tables(s, dir, "documents"))
        // plain replace, not regexp_replace: fixed single-char literal —
        // no reason to pay a regex matcher per row on the full corpus
        // (and it's exactly the oracle's replace())
        .withColumn("n_alpha", length(expr("replace(text, ' ', '')")).cast("long"))
        .withColumn("avg_tok_len_e6", expr("n_alpha * 1000000 DIV n_tok"))
        .withColumn("stop_ratio_e6", expr("n_stop * 1000000 DIV n_tok"))
        .select(col("doc_id"), col("n_tok"), col("avg_tok_len_e6"),
          col("stop_ratio_e6"), col("score_e6"))
        .orderBy(col("doc_id"))
    },

    // whitespace tokens vs BPE-ish regex tokens vs chars
    "text_token_count" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+")).cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("chars"))
        .orderBy(col("doc_id"))
    },

    // order-sensitive rolling-hash fingerprint over the token stream
    "text_fingerprint" -> { (s, dir) =>
      val toks = split(lower(col("text")), " ")
      val vals = transform(toks, t => (length(t) * 131 + ascii(t)).cast("long"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        aggregate(vals, lit(0L),
          (acc, x) => pmod(acc * 1000003L + x, lit(2147483647L))).as("fp"))
        .orderBy(col("doc_id"))
    },

    // intra-document repetition (the Gopher/C4-style quality signal:
    // boilerplate and degenerate text repeat their own n-grams):
    // rep_ratio = 1 − distinct/total trigrams. Entirely map-side on the
    // Spark side — the trigram array is built and deduped per row with no
    // explode — vs the oracle's unnest+GROUP BY; same numbers.
    "text_repetition_score" -> { (s, dir) =>
      repetitionScored(Tables(s, dir, "documents"), "doc_id", "text", 3)
        .withColumnRenamed("n_ngrams", "n_trigrams")
        .orderBy(col("doc_id"))
    }
  )

  /** PUBLIC API: per-doc n-gram repetition signal — (idCol, n_ngrams,
    * n_distinct, rep_ratio_e6 = (1 − distinct/total)·10⁶ integer). Docs
    * with fewer than `n` tokens (no n-grams) emit no row. Map-side: the
    * n-gram array is built and deduped per row, nothing explodes. */
  def repetitionScored(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val reserved = Seq("__tg", "n_ngrams", "n_distinct", "rep_ratio_e6")
    require(!df.columns.exists(reserved.contains) && !reserved.contains(idCol),
      s"repetitionScored reserves the column names ${reserved.mkString(", ")}")
    df.withColumn("__tg", Dedup.ngramArray(split(lower(col(textCol)), " "), n))
      .where(size(col("__tg")) > 0)
      .select(col(idCol),
        size(col("__tg")).cast("long").as("n_ngrams"),
        size(array_distinct(col("__tg"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio_e6",
        expr("(n_ngrams - n_distinct) * 1000000 DIV n_ngrams"))
  }

  val oracle: Map[String, String] = Map(
    "text_tokenize_tf" ->
      """SELECT word, count(*) AS tf
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY tf DESC, word""".stripMargin,
    "text_tfidf_topk" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT word, count(*) AS df FROM (SELECT DISTINCT doc_id, word FROM toks) GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, word, round(tf * ln(cast(n as double) / df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (word) CROSS JOIN n),
        |ranked AS (SELECT doc_id, word, tfidf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn FROM scored)
        |SELECT doc_id, rn, word, tfidf
        |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "text_ngram" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(string_split(lower(text), ' ')) AS word,
        |  generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |b AS (SELECT word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram FROM t)
        |SELECT bigram, count(*) AS n FROM b WHERE bigram IS NOT NULL
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    "text_lang_source_stats" ->
      """SELECT cast(GROUPING(lang) as int) AS g_lang,
        |cast(GROUPING(source) as int) AS g_source,
        |lang, source, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS sum_chars
        |FROM documents GROUP BY GROUPING SETS ((lang), (lang, source), ())
        |ORDER BY g_lang, g_source, lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "text_sentiment_lexicon" ->
      """WITH lex(word, weight) AS (VALUES ('fast', 2), ('slow', -2), ('big', 1), ('small', -1)),
        |toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |sc AS (SELECT doc_id, cast(sum(weight) as bigint) AS score
        |       FROM toks JOIN lex USING (word) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(sc.score, 0) AS score
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_langid" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |train AS (SELECT t.doc_id, t.word, d.lang FROM toks t
        |          JOIN documents d ON t.doc_id = d.doc_id WHERE d.doc_id % 10 < 8),
        |prof AS (SELECT lang AS cand_lang, word FROM (
        |  SELECT lang, word, row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, word) AS prn
        |  FROM train GROUP BY lang, word) WHERE prn <= 5),
        |ovl AS (SELECT doc_id, cand_lang, count(*) AS hits
        |        FROM (SELECT DISTINCT doc_id, word FROM toks) t
        |        JOIN prof USING (word) GROUP BY 1, 2),
        |best AS (SELECT doc_id, cand_lang AS pred_lang, hits FROM (
        |  SELECT doc_id, cand_lang, hits,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
        |  FROM ovl) WHERE rn = 1)
        |SELECT d.doc_id, d.lang,
        |  coalesce(b.pred_lang, 'unknown') AS pred_lang,
        |  coalesce(b.hits, 0) AS hits
        |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_langid_eval" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |train AS (SELECT t.doc_id, t.word, d.lang FROM toks t
        |          JOIN documents d ON t.doc_id = d.doc_id WHERE d.doc_id % 10 < 8),
        |prof AS (SELECT lang AS cand_lang, word FROM (
        |  SELECT lang, word, row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, word) AS prn
        |  FROM train GROUP BY lang, word) WHERE prn <= 5),
        |ovl AS (SELECT doc_id, cand_lang, count(*) AS hits
        |        FROM (SELECT DISTINCT doc_id, word FROM toks) t
        |        JOIN prof USING (word) GROUP BY 1, 2),
        |best AS (SELECT doc_id, cand_lang AS pred_lang FROM (
        |  SELECT doc_id, cand_lang,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rn
        |  FROM ovl) WHERE rn = 1),
        |test AS (SELECT d.lang, coalesce(b.pred_lang, 'unknown') AS pred_lang
        |  FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
        |  WHERE d.doc_id % 10 >= 8),
        |cells AS (SELECT lang, pred_lang, cast(count(*) AS bigint) AS n
        |  FROM test GROUP BY 1, 2),
        |acc AS (SELECT round(cast(sum(CASE WHEN lang = pred_lang THEN n
        |    ELSE 0 END) AS double) / cast(sum(n) AS double), 6)
        |    AS test_accuracy
        |  FROM cells)
        |SELECT lang, pred_lang, n, test_accuracy
        |FROM cells CROSS JOIN acc ORDER BY lang, pred_lang""".stripMargin,
    "text_quality_score" ->
      s"""WITH d AS (SELECT *, cast(length(replace(text, ' ', '')) as bigint) AS n_alpha
         |  FROM ($sqlQualityBase))
         |SELECT doc_id, n_tok,
         |  n_alpha * 1000000 // n_tok AS avg_tok_len_e6,
         |  n_stop * 1000000 // n_tok AS stop_ratio_e6,
         |  $sqlScoreE6 AS score_e6
         |FROM d ORDER BY doc_id""".stripMargin,
    "text_token_count" ->
      """SELECT doc_id,
        |cast(len(string_split(text, ' ')) as bigint) AS ws_tokens,
        |cast(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) as bigint) AS re_tokens,
        |cast(length(text) as bigint) AS chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |list_reduce(
        |  list_prepend(0::bigint,
        |    list_transform(string_split(lower(text), ' '),
        |      t -> (length(t) * 131 + ascii(t))::bigint)),
        |  (acc, x) -> (acc * 1000003 + x) % 2147483647) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_repetition_score" ->
      s"""WITH ${Curation.sqlNgrams(3, "documents", distinct = false)},
         |t AS (SELECT doc_id, count(*) AS n_trigrams, count(DISTINCT bg) AS n_distinct
         |  FROM g GROUP BY doc_id)
         |SELECT doc_id, n_trigrams, n_distinct,
         |  (n_trigrams - n_distinct) * 1000000 // n_trigrams AS rep_ratio_e6
         |FROM t WHERE n_trigrams > 0 ORDER BY doc_id""".stripMargin
  )
}
