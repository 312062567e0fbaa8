package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus composition: temperature-weighted mixing + unigram-LM scoring.
  *
  * - `pipeline_mix_temperature`: the α-temperature sampling recipe from
  *   the multilingual-pretraining literature (sample language l with
  *   probability ∝ n_l^α, α=0.5) realized as DETERMINISTIC down-sampling:
  *   per-group keep-rate r_l = (n_min / n_l)^(1−α), normalized so the
  *   SMALLEST group keeps everything (rates in (0,1], no up-sampling —
  *   the up-sampling lever is `pipeline_mix_epochs`). A row is kept iff
  *   an arithmetic LCG bucket of its key falls under floor(r_l·10⁶) —
  *   content-stable across engines, retries, and repartitioning, unlike
  *   `sample(fraction)`. At α=0.5 the rate is a single IEEE sqrt/divide
  *   (bit-identical in both engines — the declared query pins α=0.5 for
  *   exactly this reason); thresholds are compared as integers.
  *
  *   Scale shape: pass 1 is a column-pruned count per group (|groups|
  *   rows out); the 1-row min joins back via crossJoin(broadcast(…));
  *   pass 2 re-scans documents and filters MAP-SIDE against the
  *   broadcast rate table — no shuffle of the corpus at any scale, the
  *   exact shape a 100 TB mixing job wants. Two scans by design: caching
  *   the corpus to save the second scan costs more than the re-read
  *   (same trade as text_langid, SCALE.md round-7 census).
  *
  * - `text_lm_unigram_score`: CCNet-style LM quality signal — train a
  *   unigram LM on the corpus itself, score each document by average
  *   token surprisal (−ln p(w), the unigram cross-entropy / length). A
  *   quality filter thresholds on this to drop gibberish (high surprisal)
  *   and boilerplate (abnormally low). Per-token surprisals are cast to
  *   decimal(18,12) BEFORE the per-doc sum (partition-order-proof, the
  *   profile_entropy discipline); the vocab relation is tiny (≤ corpus
  *   vocab) and broadcast, so scoring is one map-side join + one narrow
  *   (doc_id, decimal) shuffle. At 100 TB the vocab table for a real
  *   tokenizer is ≤ a few 100k rows — still broadcastable; training the
  *   LM is one map-side-combined count pass.
  *
  * Both declared queries run THROUGH the public kernels below
  * ([[temperatureRates]]/[[mixTemperature]], [[unigramSurprisal]]), so
  * the oracle gate exercises the API — the GraftOpsSpec pattern.
  */
object Mix {

  /** Keep-rate table for [[mixTemperature]]: one row per group —
    * (groupCol, n_docs, rate_e6) with rate_e6 = floor((n_min/n)^(1−α)·10⁶).
    * α=0.5 routes through sqrt (IEEE-exact, engine-portable); other α
    * through pow (correct, but pow's last bit is libm-dependent — keep
    * oracle-gated uses at 0.5).
    *
    * rate_e6 is built NON-NULLABLE (coalesce over the nullable min()):
    * otherwise a downstream `bucket < rate_e6` filter pushes an
    * isnotnull(floor(…)) CONDITION onto the 1-row broadcast cross join,
    * turning it into a conditioned BNLJ (PlanSpec guard). */
  def temperatureRates(df: DataFrame, groupCol: String, alpha: Double = 0.5)
      : DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // |groups| rows, lazily materialized: BOTH consumers (the 1-row min
    // aggregate and the crossJoin left side) read the checkpoint instead
    // of re-scanning the input per branch — column pruning breaks the
    // subtree equality exchange-reuse needs (the ScanAudit trap), so
    // without this the stats pass runs twice. Blocks are reclaimed by
    // ContextCleaner once the relation is unreferenced.
    val stats = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(false)
    val minN = stats.agg(min(col("n_docs")).as("n_min"))
    val ratio = col("n_min").cast("double") / col("n_docs").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1d - alpha)
    stats.crossJoin(broadcast(minN))
      .withColumn("rate_e6",
        coalesce(floor(rate * 1000000d), lit(0L)).cast("long"))
      .select(col(groupCol), col("n_docs"), col("rate_e6"))
  }

  /** Deterministic LCG bucket in [0, 10⁶) over a bounded numeric key —
    * split_train_test's overflow contract (key % 100003 keeps the int64
    * product exact in any engine); multiplier distinct from the
    * split/shuffle hashes so the three assignments don't correlate.
    * pmod, not %: a signed remainder on a negative key would be negative
    * and thus below EVERY rate threshold — negative-key rows would
    * bypass downsampling entirely. (The declared oracle mirrors with %
    * under its doc_id ≥ 0 fixture contract, where the two agree.) */
  def mixBucket(key: Column): Column =
    pmod((key % 100003L) * 69069L, lit(1000000L))

  /** PUBLIC API: temperature-downsample `df` so group sizes flatten
    * toward n^α — returns the kept rows (original columns). Pass a
    * precomputed [[temperatureRates]] to avoid rebuilding the stats pass
    * when the caller also reports on the rates. The corpus side never
    * shuffles: the rate table joins in broadcast and the LCG filter is
    * map-side. Group keys compare NULL-SAFE — a null group is a group
    * (it counts toward n_min and keeps its own rate), matching groupBy,
    * never silently dropped. */
  def mixTemperature(df: DataFrame, groupCol: String, keyCol: String,
      alpha: Double = 0.5, rates: Option[DataFrame] = None): DataFrame = {
    require(!df.columns.contains("rate_e6") && !df.columns.contains("n_docs"),
      "mixTemperature reserves the column names rate_e6, n_docs")
    val r = rates.getOrElse(temperatureRates(df, groupCol, alpha))
      .select(col(groupCol), col("rate_e6"))
    df.join(broadcast(r), df(groupCol) <=> r(groupCol))
      .where(mixBucket(col(keyCol)) < r("rate_e6"))
      .select(df.columns.map(df(_)).toIndexedSeq: _*)
  }

  /** PUBLIC API: per-document average unigram surprisal (self-trained
    * corpus LM) — returns (idCol, n_tok, avg_nll), avg_nll = round-6 of
    * Σ −ln p(w) / n_tok with decimal(18,12) per-token terms. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(lower(col(textCol)), " ")).as("word"))
    // |vocab| rows, lazily materialized: the total aggregate and the
    // probs projection both consume vocab with different prunings — the
    // checkpoint keeps the corpus at exactly TWO tokenization passes
    // (LM training + scoring) instead of three (ScanAudit census)
    val vocab = toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val probs = vocab
      .crossJoin(broadcast(vocab.agg(sum(col("cnt")).as("total"))))
      .select(col("word"),
        (-log(col("cnt").cast("double") / col("total").cast("double")))
          .cast("decimal(18,12)").as("nll"))
    toks.join(broadcast(probs), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6).as("avg_nll"))
  }

  /** PUBLIC API: per-document average INTERPOLATED bigram surprisal —
    * the order-sensitive upgrade of [[unigramSurprisal]]:
    * p(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N, avg −ln p over the
    * document's bigrams, round-6. Bigrams come from the native
    * [[graft.functions.WordNgrams]] pass (map-side, no per-token
    * shuffle); the LM tables are |bigram-vocab|-sized and broadcast
    * back for scoring. Per-term nll is cast decimal(18,12) before the
    * SUM (associative → partition-order-proof), the unigram discipline.
    * NOTE for mirrors: 1−λ must be COMPUTED (1.0 − 0.9), not written
    * 0.1 — the IEEE subtraction result 0.09999999999999998 is what both
    * engines must share. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val toksArr = df.select(col(idCol), split(lower(col(textCol)), " ").as("toks"))
    val toks = toksArr.select(col(idCol), explode(col("toks")).as("word"))
    val bigrams = toksArr.select(col(idCol),
      explode(ColumnBridge.column(graft.functions.WordNgrams(
        ColumnBridge.expression(col("toks")), 2))).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(false)
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val uni = toks.groupBy("word").agg(count(lit(1)).as("cu"))
      .localCheckpoint(false)
    val tot = uni.agg(sum("cu").as("t"))
    val probs = c12.join(c1, "w1")
      .join(uni.withColumnRenamed("word", "w2"), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"),
        (-log(lit(lambda) * (col("c12").cast("double") / col("c1").cast("double"))
          + lit(1.0 - lambda) * (col("cu").cast("double") / col("t").cast("double"))))
          .cast("decimal(18,12)").as("nll"))
    bigrams.join(broadcast(probs), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6).as("avg_nll"))
  }

  val queries: Map[String, Q] = Map(
    // CCNet-style perplexity band filter: score every doc with the
    // self-trained unigram LM, decile-bucket the scores with the
    // distributed ntile (never a single-task global window), keep the
    // middle band (deciles 3–8) — dropping the too-predictable head
    // (boilerplate) and the too-surprising tail (noise). Per-band
    // census + keep decision; the band edges document the cut.
    "text_perplexity_band_filter" -> { (s, dir) =>
      val scored = unigramSurprisal(Tables(s, dir, "documents"), "doc_id", "text")
      GraftOps.distributedNtile(scored, Seq("avg_nll", "doc_id"), 10, "band")
        .groupBy(col("band").cast("long").as("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          min(col("avg_nll")).as("min_nll"),
          max(col("avg_nll")).as("max_nll"))
        .withColumn("kept", col("band").between(3L, 8L))
        .orderBy("band")
    },

    // collocation mining: top bigrams by pointwise mutual information
    // PMI = ln(c₁₂·N / (cL·cR)) over bigram-position marginals — the
    // corpus-statistics pass behind multi-word-expression detection.
    // The ln ARGUMENT is a fixed two-product ratio of exact counts
    // (< 2⁵³); round-6 absorbs libm last-ulp, and the top-50 ORDERS BY
    // THE ROUNDED value (pre-round ulp diffs can't reorder), tiebreak
    // (w1, w2). Bigrams ride the native WordNgrams map-side pass; the
    // marginal tables are bigram-vocab-sized.
    "text_collocations_pmi" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val bigrams = Tables(s, dir, "documents")
        .select(split(lower(col("text")), " ").as("toks"))
        .select(explode(ColumnBridge.column(graft.functions.WordNgrams(
          ColumnBridge.expression(col("toks")), 2))).as("bg"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
        .withColumn("w2", substring_index(col("bg"), " ", -1))
      val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint(false)
      val cL = c12.groupBy("w1").agg(sum("c12").as("cl"))
      val cR = c12.groupBy("w2").agg(sum("c12").as("cr"))
      val nb = c12.agg(sum("c12").as("nb"))
      val dd = (c: org.apache.spark.sql.Column) => c.cast("double")
      c12.join(cL, "w1").join(cR, "w2")
        .crossJoin(broadcast(nb))
        .where(col("c12") >= 5)
        .select(col("w1"), col("w2"), col("c12"),
          // + 0.0 normalizes IEEE -0.0 across engines (DuckDB round keeps
          // the sign of a tiny negative PMI, Spark's BigDecimal round not)
          (round(log((dd(col("c12")) * dd(col("nb"))) /
            (dd(col("cl")) * dd(col("cr")))), 6) + lit(0.0)).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(50)
    },

    // Heaps-law vocabulary growth: cumulative distinct vocabulary vs
    // cumulative tokens across id-range deciles of the corpus — the
    // curve that sizes tokenizer vocabularies and dedup dictionaries.
    // Each word is attributed to its FIRST document (min doc_id — one
    // grouped pass over the exploded tokens), so "new vocabulary per
    // bucket" needs no cross-bucket distinct; cumulative totals run
    // through distributedRunningSum over the 10-row rollup. All
    // integral.
    "text_vocab_growth" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        .localCheckpoint(false) // feeds token counts AND first-occurrence
      val nd = docs.agg((max("doc_id") + 1).as("ndocs"))
      val tokB = docs.select(col("doc_id"), size(col("toks")).cast("long").as("nt"))
        .crossJoin(broadcast(nd))
        .groupBy(expr("CAST((doc_id * 10) DIV ndocs AS int)").as("bucket"))
        .agg(sum("nt").as("toks_new"))
      val vocB = docs.select(explode(col("toks")).as("word"), col("doc_id"))
        .groupBy("word").agg(min("doc_id").as("fd"))
        .crossJoin(broadcast(nd))
        .groupBy(expr("CAST((fd * 10) DIV ndocs AS int)").as("bucket"))
        .agg(count(lit(1)).as("vocab_new"))
      val merged = tokB.join(vocB, Seq("bucket"), "left")
        .select(col("bucket"), col("toks_new"),
          coalesce(col("vocab_new"), lit(0L)).as("vocab_new"))
        .localCheckpoint(false) // feeds two cumulative kernels + the join
      def cum(vc: String, out: String) = graft.llm.Chunking.distributedRunningSum(
        merged.select(lit(0).as("__p"), col("bucket"), col(vc)),
        "__p", "bucket", vc, out).select("bucket", out)
      merged
        .join(cum("toks_new", "tokens_cum"), "bucket")
        .join(cum("vocab_new", "vocab_cum"), "bucket")
        .select("bucket", "toks_new", "vocab_new", "tokens_cum", "vocab_cum")
        .orderBy("bucket")
    },

    "text_lm_bigram_score" -> { (s, dir) =>
      bigramSurprisal(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    },

    "pipeline_mix_temperature" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val rates = temperatureRates(docs, "lang")
      // ONE corpus scan: the keep decision rides CONDITIONAL aggregates
      // over the broadcast-joined rates — a filtered-subset aggregate
      // plus a rates join-back would consume `rates` twice with
      // divergent prunings and re-run its stats pass (ScanAudit trap).
      // Every group appears (unfiltered join), so zero-kept groups
      // surface as 0 rows kept, exactly the oracle's left-join+coalesce.
      val keep = mixBucket(col("doc_id")) < col("rate_e6")
      docs.join(broadcast(rates), Seq("lang"))
        .groupBy(col("lang"))
        .agg(max(col("n_docs")).as("n_docs"),
          max(col("rate_e6")).as("rate_e6"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
          sum(when(keep, col("n_chars")).otherwise(0L)).as("sum_chars_kept"))
        .orderBy(col("lang"))
    },

    "text_lm_unigram_score" -> { (s, dir) =>
      unigramSurprisal(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "text_collocations_pmi" ->
      """WITH toks AS (SELECT doc_id, u.el.s AS word, u.el.i AS i
        |  FROM documents,
        |  unnest(list_transform(string_split(lower(text), ' '),
        |    (s0, i) -> struct_pack(s := s0, i := i))) AS u(el)),
        |bg AS (SELECT a.word AS w1, b.word AS w2
        |       FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |cl AS (SELECT w1, sum(c12) AS cl FROM c12 GROUP BY 1),
        |cr AS (SELECT w2, sum(c12) AS cr FROM c12 GROUP BY 1),
        |nbt AS (SELECT sum(c12) AS nb FROM c12)
        |SELECT c12.w1, c12.w2, c12,
        |  round(ln((cast(c12 as double) * cast(nb as double)) /
        |    (cast(cl as double) * cast(cr as double))), 6) + 0.0 AS pmi
        |FROM c12 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN nbt
        |WHERE c12 >= 5
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    "text_vocab_growth" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |           FROM documents),
        |nd AS (SELECT max(doc_id) + 1 AS ndocs FROM d),
        |tb AS (SELECT cast((doc_id * 10) // ndocs as int) AS bucket,
        |         cast(sum(len(toks)) as bigint) AS toks_new
        |       FROM d CROSS JOIN nd GROUP BY 1),
        |fw AS (SELECT word, min(doc_id) AS fd FROM
        |        (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |         FROM documents) GROUP BY 1),
        |vb AS (SELECT cast((fd * 10) // ndocs as int) AS bucket,
        |         count(*) AS vocab_new
        |       FROM fw CROSS JOIN nd GROUP BY 1),
        |m AS (SELECT tb.bucket, toks_new, coalesce(vocab_new, 0) AS vocab_new
        |      FROM tb LEFT JOIN vb USING (bucket))
        |SELECT bucket, toks_new, vocab_new,
        |  cast(sum(toks_new) OVER wc as bigint) AS tokens_cum,
        |  cast(sum(vocab_new) OVER wc as bigint) AS vocab_cum
        |FROM m
        |WINDOW wc AS (ORDER BY bucket
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY bucket""".stripMargin,
    "text_lm_bigram_score" ->
      """WITH toks AS (SELECT doc_id, u.el.s AS word, u.el.i AS i
        |  FROM documents,
        |  unnest(list_transform(string_split(lower(text), ' '),
        |    (s0, i) -> struct_pack(s := s0, i := i))) AS u(el)),
        |bg AS (SELECT a.doc_id, a.word AS w1, b.word AS w2
        |       FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |uni AS (SELECT word, count(*) AS cu FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS t FROM toks),
        |probs AS (SELECT c12.w1, c12.w2,
        |    cast(-ln(0.9 * (cast(c12 as double) / cast(c1 as double))
        |      + (1.0 - 0.9) * (cast(cu as double) / cast(t as double)))
        |      as decimal(18,12)) AS nll
        |  FROM c12 JOIN c1 USING (w1) JOIN uni ON c12.w2 = uni.word CROSS JOIN tot)
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  round(cast(sum(nll) as double) / count(*), 6) AS avg_nll
        |FROM bg JOIN probs ON bg.w1 = probs.w1 AND bg.w2 = probs.w2
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "pipeline_mix_temperature" ->
      """WITH stats AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
        |m AS (SELECT min(n_docs) AS n_min FROM stats),
        |rates AS (SELECT lang, n_docs,
        |    cast(floor(sqrt(cast(n_min as double) / cast(n_docs as double))
        |      * 1000000) as bigint) AS rate_e6
        |  FROM stats, m),
        |kept AS (SELECT d.lang, count(*) AS n_kept,
        |    cast(sum(d.n_chars) as bigint) AS sum_chars_kept
        |  FROM documents d JOIN rates r ON d.lang = r.lang
        |  WHERE (d.doc_id % 100003) * 69069 % 1000000 < r.rate_e6
        |  GROUP BY 1)
        |SELECT r.lang, r.n_docs, r.rate_e6,
        |  coalesce(k.n_kept, 0) AS n_kept,
        |  coalesce(k.sum_chars_kept, 0) AS sum_chars_kept
        |FROM rates r LEFT JOIN kept k ON r.lang = k.lang
        |ORDER BY r.lang""".stripMargin,
    "text_lm_unigram_score" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |vocab AS (SELECT word, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM vocab),
        |probs AS (SELECT word,
        |    cast(-ln(cast(cnt as double) / cast(total as double))
        |      as decimal(18,12)) AS nll
        |  FROM vocab, tot)
        |SELECT t.doc_id, count(*) AS n_tok,
        |  round(cast(sum(p.nll) as double) / count(*), 6) AS avg_nll
        |FROM toks t JOIN probs p ON t.word = p.word
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "text_perplexity_band_filter" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |vocab AS (SELECT word, count(*) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS total FROM vocab),
        |probs AS (SELECT word,
        |    cast(-ln(cast(cnt as double) / cast(total as double))
        |      as decimal(18,12)) AS nll
        |  FROM vocab, tot),
        |scored AS (SELECT t.doc_id, cast(count(*) AS bigint) AS n_tok,
        |    round(cast(sum(p.nll) as double) / count(*), 6) AS avg_nll
        |  FROM toks t JOIN probs p ON t.word = p.word GROUP BY 1),
        |b AS (SELECT *, ntile(10) OVER (ORDER BY avg_nll, doc_id) AS band
        |      FROM scored)
        |SELECT cast(band AS bigint) AS band,
        |  cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(n_tok) AS bigint) AS total_tokens,
        |  min(avg_nll) AS min_nll, max(avg_nll) AS max_nll,
        |  band BETWEEN 3 AND 8 AS kept
        |FROM b GROUP BY band ORDER BY band""".stripMargin
  )
}
