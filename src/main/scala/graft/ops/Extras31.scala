package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-10 batch 3: tokenizer fertility (the tokenizer-quality metric),
  * train/test n-gram novelty by source (the memorization-risk profile),
  * and contiguous token-balanced shard assignment (training-data layout).
  */
object Extras31 {

  val queries: Map[String, Q] = Map(
    // tokenizer fertility per language: regex tokens (the BPE-ish
    // lexer's [a-z]+|[0-9]+ pieces) per whitespace word — the standard
    // "how many subwords does a word cost in this language" metric that
    // drives per-language training-budget math. One map-side pass, one
    // tiny lang-grain aggregate; integer sums, a single division at emit.
    "text_tokenizer_fertility" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("ws"),
          regexp_count(col("text"), lit("[a-z]+|[0-9]+")).cast("long").as("re"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws")).as("ws_tokens"),
          sum(col("re")).as("re_tokens"))
        .select(col("lang"), col("n_docs"), col("ws_tokens"), col("re_tokens"),
          round(col("re_tokens").cast(DoubleType) /
            col("ws_tokens").cast(DoubleType), 6).as("fertility"))
        .orderBy("lang")
    },

    // n-gram novelty of the test split vs the train split, per source —
    // the memorization-risk profile (a source whose test docs share most
    // 8-grams with train is either templated or leaked). Deterministic
    // id-mod split (the split_train_test rule); train grams collapse to
    // a DISTINCT set once; per-doc distinct grams via the map-side
    // array_distinct (shingleSet — no global distinct shuffle of the
    // per-doc grams); the membership probe is one unhinted semi-ish left
    // join that AQE broadcasts while the train vocabulary is small.
    "text_ngram_novelty" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val train = docs.where(col("doc_id") % 10 < 8)
      val test = docs.where(col("doc_id") % 10 >= 8)
      val trainG = GraftOps.shingleSet(train, "doc_id", "text", 8)
        .select(col("bg")).distinct()
      val testG = GraftOps.shingleSet(test, "doc_id", "text", 8)
      val grams = testG.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      val seen = testG.join(trainG, Seq("bg"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_seen"))
      val perDoc = grams.join(seen, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_seen"), lit(0L)).as("n_seen"))
      test.select(col("doc_id"), col("source"))
        .join(perDoc, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_test_docs"),
          coalesce(sum(col("n_grams")), lit(0L)).as("n_grams"),
          coalesce(sum(col("n_seen")), lit(0L)).as("n_seen"))
        .select(col("source"), col("n_test_docs"), col("n_grams"), col("n_seen"),
          round(lit(1.0) - col("n_seen").cast(DoubleType) /
            nullif(col("n_grams"), lit(0L)).cast(DoubleType), 6)
            .as("novelty_rate"))
        .orderBy("source")
    },

    // contiguous token-balanced shard assignment — the training-data
    // layout step after curation: docs in id order split into 8 shards
    // of ~equal TOKEN mass (not doc count), shard = ⌊exclusive-cumsum ·
    // 8 / total⌋, so shards are contiguous id ranges (streaming-friendly
    // IO: each reader consumes one dense range). The cumsum rides the
    // distributed prefix sum; everything is integer math, no rounding
    // surface at all.
    "pipeline_token_shard_assign" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(lit(0L).as("__p"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
      val cum = GraftOps.distributedRunningSum(d, "__p", "doc_id", "tok", "cum")
      val tot = d.agg(sum(col("tok")).as("total"))
      cum.crossJoin(broadcast(tot))
        .select(col("doc_id"), col("tok"),
          expr("((cum - tok) * 8) DIV total").as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("shard")
    }
  )

  /** shared 8-gram builder CTE (the leakage-eval mirror): DuckDB has no
    * n-gram primitive, so grams come from 7 lead() windows per doc. */
  private val sqlGrams8 =
    """pos AS (SELECT doc_id,
      |    unnest(string_split(lower(text), ' ')) AS word,
      |    generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      |  FROM documents),
      |g AS (SELECT DISTINCT doc_id, bg FROM (
      |  SELECT doc_id, word ||
      |    ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w ||
      |    ' ' || lead(word, 3) OVER w || ' ' || lead(word, 4) OVER w ||
      |    ' ' || lead(word, 5) OVER w || ' ' || lead(word, 6) OVER w ||
      |    ' ' || lead(word, 7) OVER w AS bg
      |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
      |  WHERE bg IS NOT NULL)""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_tokenizer_fertility" ->
      """WITH t AS (SELECT lang,
        |    cast(len(string_split(text, ' ')) AS bigint) AS ws,
        |    cast(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS bigint)
        |      AS re
        |  FROM documents)
        |SELECT lang, cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(ws) AS bigint) AS ws_tokens,
        |  cast(sum(re) AS bigint) AS re_tokens,
        |  round(cast(sum(re) AS double) / cast(sum(ws) AS double), 6)
        |    AS fertility
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "text_ngram_novelty" ->
      s"""WITH $sqlGrams8,
        |tr AS (SELECT DISTINCT bg FROM g WHERE doc_id % 10 < 8),
        |te AS (SELECT doc_id, bg FROM g WHERE doc_id % 10 >= 8),
        |perdoc AS (SELECT doc_id,
        |    cast(count(*) AS bigint) AS n_grams,
        |    cast(sum(CASE WHEN bg IN (SELECT bg FROM tr) THEN 1 ELSE 0 END)
        |      AS bigint) AS n_seen
        |  FROM te GROUP BY doc_id)
        |SELECT d.source, cast(count(*) AS bigint) AS n_test_docs,
        |  cast(coalesce(sum(p.n_grams), 0) AS bigint) AS n_grams,
        |  cast(coalesce(sum(p.n_seen), 0) AS bigint) AS n_seen,
        |  round(1.0 - cast(coalesce(sum(p.n_seen), 0) AS double)
        |    / cast(nullif(coalesce(sum(p.n_grams), 0), 0) AS double), 6)
        |    AS novelty_rate
        |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
        |WHERE d.doc_id % 10 >= 8
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "pipeline_token_shard_assign" ->
      """WITH d AS (SELECT doc_id,
        |    cast(len(string_split(text, ' ')) AS bigint) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok,
        |    sum(tok) OVER (ORDER BY doc_id) - tok AS excl
        |  FROM d),
        |tot AS (SELECT cast(sum(tok) AS bigint) AS total FROM d),
        |a AS (SELECT doc_id, tok, (excl * 8) // total AS shard
        |  FROM c CROSS JOIN tot)
        |SELECT cast(shard AS bigint) AS shard,
        |  cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(tok) AS bigint) AS tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin
  )
}
