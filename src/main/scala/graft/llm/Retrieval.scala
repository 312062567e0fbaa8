package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Sparse-text retrieval over the documents corpus — the token-space
  * complement of the embedding-space sim_* family:
  *
  *   - BM25 ranked retrieval (Okapi k1 = 1.2, b = 0.75, the
  *     Lucene-style always-positive idf ln((N − df + 0.5)/(df + 0.5) + 1))
  *     for a fixed query term set;
  *   - all-pairs TF-IDF cosine similarity over dense L2-normalized
  *     per-doc vectors (bounded vocabulary), pair-joined within
  *     (lang, source) blocks through the native codegen dot product —
  *     see the query comment for the dense-vs-inverted-index tradeoff.
  *
  * Scale discipline: BM25 filters the posting lists to the query's terms
  * BEFORE any shuffle (the per-doc frame is |query|-bounded), ending in
  * one TakeOrdered top-k. The cosine pair join is blocked on
  * (lang, source) — the same label-blocking lever as the sim family —
  * so the candidate pair count is Σ_block O(block²), never corpus²; on a
  * natural heavy-tailed vocabulary you would additionally cap document
  * frequency (drop df > cap posting lists, which carry ~zero idf weight
  * anyway) to bound the per-term fan-out — this corpus's synthetic
  * 31-word vocabulary is dense, so the cap would be vacuous here and the
  * block key is the operative lever.
  *
  * Float discipline: idf and tf-idf weights carry the house round-6-on-ln
  * rule (libm ln differs by ulps across engines); per-term score
  * contributions are cast to DECIMAL before the (associative, exact)
  * per-doc/per-pair sums — 18,12 for BM25's |query|-bounded sums, 24,8
  * for the cosine norms/dots so the summed unscaled magnitude stays
  * below 2⁵³ (exact decimal→double cast; the profile_anova_groups
  * lesson). sqrt is IEEE-correctly-rounded (safe); final scores are
  * rounded and ORDERED on the rounded value.
  */
object Retrieval {

  // one rare term ('dup', df ≈ 5%) + three common ones — exercises the
  // idf spread end to end
  private val bm25Terms = Seq("dup", "merge", "scan", "batch")
  private val k1 = 1.2
  private val b = 0.75

  /** (doc_id, lang, source, word, cnt) — map-side native TokenCounts
    * pass; rows are distinct (doc, word) pairs by construction. */
  private def termFreqs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    Tables(s, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(ColumnBridge.column(graft.functions.TokenCounts(
          ColumnBridge.expression(col("toks"))))).as("wc"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("wc.word").as("word"), col("wc.cnt").as("cnt"))
  }

  private val sqlToks =
    """SELECT doc_id, lang, source, word, cast(count(*) AS bigint) AS cnt
      |FROM (SELECT doc_id, lang, source,
      |        unnest(string_split(lower(text), ' ')) AS word FROM documents)
      |GROUP BY doc_id, lang, source, word""".stripMargin

  val queries: Map[String, Q] = Map(

    // BM25 top-20 docs for the fixed query term set.
    "text_bm25_topk" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .withColumn("toks", split(lower(col("text")), " "))
      // dl feeds the corpus stats AND the per-term join; tf feeds the
      // df counts AND the scoring join — checkpoint both (doc-count- and
      // |query|·docs-sized) so the corpus is tokenized once per frame,
      // not once per consumer
      val dl = docs.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
        .localCheckpoint(false)
      val tf = termFreqs(s, dir).where(col("word").isin(bm25Terms: _*))
        .select("doc_id", "word", "cnt")
        .localCheckpoint(false)
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("dl_total"))
      val avgdl = col("dl_total").cast(DoubleType) / col("n")
      val idf = round(log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6)
      val term = idf * (col("cnt") * (k1 + 1.0)) /
        (col("cnt") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
      tf.join(dfreq, "word").join(dl, "doc_id").crossJoin(broadcast(stats))
        .select(col("doc_id"), term.cast(DecimalType(18, 12)).as("t"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
          sum(col("t")).cast(DecimalType(18, 12)).cast(DoubleType).as("s"))
        .select(col("doc_id"), col("n_terms"), round(col("s"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // blocked TF-IDF cosine pairs ≥ 0.8, prefix-filtered sparse
    // formulation (round 11). The r10 dense form joined all pairs within
    // a (lang, source) block; block size grows WITH the corpus (the
    // lang×source grid is fixed), so the candidate stage was quadratic —
    // masked at the 10× probe (exponent 0.86, fixed overhead) and
    // catastrophic at 100× (the dense vectors also carried |vocab| dims,
    // which grows with the corpus). The scale-safe exact shape is the
    // AllPairs/PPJoin prefix filter: for L2-normalized vectors, a pair
    // can reach cos ≥ θ only if it shares a term in each side's PREFIX
    // (any per-doc term subset whose complement has norm < θ — here the
    // highest-weight-first head, the smallest such set). Candidates =
    // prefix-postings ⋈ full-postings (superset of qualifying pairs, so
    // results are IDENTICAL to all-pairs); exact cosine then sums
    // floor-quantized shared-term products per candidate (integer sum —
    // order-free, bit-equal in both engines; products are ≥ 0 because
    // idf = ln(n/df) ≥ 0). Under corpus growth the shuffle is O(tokens)
    // + O(candidates·shared_terms): cross-copy vocabularies don't
    // overlap, so candidates track TRUE near-pairs, not block size².
    "text_tfidf_cosine_pairs" -> { (s, dir) =>
      val theta = 0.8
      val tf = termFreqs(s, dir).localCheckpoint(false)
      val n = Tables(s, dir, "documents").agg(count(lit(1)).as("n"))
      val w = tf.join(tf.groupBy("word").agg(count(lit(1)).as("df")), "word")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("lang"), col("source"), col("word"),
          round(col("cnt") * log(col("n").cast(DoubleType) / col("df")), 6).as("wgt"))
      val norm = w.groupBy("doc_id")
        .agg(sum((col("wgt") * col("wgt")).cast(DecimalType(24, 8)))
          .cast(DoubleType).as("n2"))
      // feeds the prefix flags and BOTH product sides — build once
      val wn = w.join(norm, "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("word"),
          (col("wgt") / sqrt(col("n2"))).as("wn"))
        .localCheckpoint(false)
      // prefix = highest-weight-first head; a term stays while the
      // exclusive squared mass before it is < 1 − θ'² (over-inclusion is
      // sound, exclusion must never be wrong). θ' = θ − 1e-6, NOT θ: the
      // final filter accepts round(cos, 6) ≥ θ, which admits raw cosines
      // down to θ − 5e-7, so the prefix bound must be derived from the
      // post-rounding threshold or a boundary pair whose shared terms all
      // sit outside both prefixes would be pruned here yet emitted by the
      // all-pairs oracle. The extra 1e-9 absorbs the csq float error.
      val thetaEff = theta - 1e-6
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("wn").desc, col("word"))
      val pref = wn
        .withColumn("csq", sum(col("wn") * col("wn")).over(
          byDoc.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)))
        .where(coalesce(col("csq"), lit(0.0)) <
          lit(1.0 - thetaEff * thetaEff + 1e-9))
        .select(col("doc_id").as("pd"), col("lang"), col("source"), col("word"))
      val full = wn.select(col("doc_id").as("fd"), col("lang"),
        col("source"), col("word"))
      val cand = pref.join(full, Seq("lang", "source", "word"))
        .where(col("pd") =!= col("fd"))
        .select(least(col("pd"), col("fd")).as("doc_a"),
          greatest(col("pd"), col("fd")).as("doc_b"))
        .distinct()
      // r14 verify-stage rework (guide §2.3 "shuffle keys and metadata
      // instead of payloads"): the old exact-cosine stage joined the
      // candidate pairs back to BOTH posting lists and re-aggregated at
      // pair×term grain — the widest exchanges in the plan. Collapsing
      // each doc's postings once into a sorted sparse vector (vocabulary-
      // bounded per doc) turns the verify into two pair-grain joins plus
      // a map-side native merge-intersect dot ([[graft.functions
      // .SparseQDot]]) that accumulates the SAME floor-quantized per-term
      // products as an exact long — cosines bit-identical, the
      // pair×term-grain shuffle and the final pair groupBy gone.
      val vecs = wn.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("word"), col("wn")))).as("vec"))
        .localCheckpoint(false) // feeds both pair sides
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val qd = ColumnBridge.column(graft.functions.SparseQDot(
        ColumnBridge.expression(col("va")), ColumnBridge.expression(col("vb"))))
      // INVARIANT (r15, from the r14 advisor): the old postings-join
      // shape DROPPED candidate pairs sharing zero terms, while this
      // pair-grain form yields a cos = 0.0 row for them — structurally
      // identical output only because (a) every LSH candidate pair
      // shares ≥ 1 band, hence ≥ 1 term, by construction, and (b) the
      // declared theta = 0.8 > 0 filters the degenerate row out anyway.
      // If theta is ever parameterized, keep it > 0 or add a qd > 0
      // filter to preserve the exact old output set.
      cand
        .join(vecs.select(col("doc_id").as("doc_a"), col("vec").as("va")), "doc_a")
        .join(vecs.select(col("doc_id").as("doc_b"), col("vec").as("vb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(qd.cast(DoubleType) / 1e12, 6).as("cos"))
        .where(col("cos") >= theta)
        .orderBy("doc_a", "doc_b")
    }
  )

  val oracle: Map[String, String] = Map(
    "text_bm25_topk" ->
      s"""WITH toks AS ($sqlToks),
         |dl AS (SELECT doc_id,
         |         cast(len(string_split(lower(text), ' ')) AS bigint) AS dl
         |       FROM documents),
         |tf AS (SELECT doc_id, word, cnt FROM toks
         |       WHERE word IN ('dup', 'merge', 'scan', 'batch')),
         |dfreq AS (SELECT word, cast(count(*) AS bigint) AS df FROM tf GROUP BY word),
         |st AS (SELECT cast(count(*) AS bigint) AS n,
         |              cast(sum(dl) AS bigint) AS dl_total FROM dl),
         |terms AS (
         |  SELECT tf.doc_id,
         |    cast(round(ln((st.n - df + 0.5) / (df + 0.5) + 1.0), 6)
         |      * (cnt * (1.2 + 1.0))
         |      / (cnt + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
         |          / (cast(st.dl_total AS double) / st.n)))
         |      AS decimal(18,12)) AS t
         |  FROM tf JOIN dfreq ON tf.word = dfreq.word
         |          JOIN dl ON tf.doc_id = dl.doc_id
         |          CROSS JOIN st)
         |SELECT doc_id, cast(count(*) AS bigint) AS n_terms,
         |       round(cast(cast(sum(t) AS decimal(18,12)) AS double), 6) AS score
         |FROM terms GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "text_tfidf_cosine_pairs" ->
      s"""WITH toks AS ($sqlToks),
         |n AS (SELECT cast(count(*) AS bigint) AS n FROM documents),
         |dfreq AS (SELECT word, cast(count(*) AS bigint) AS df FROM toks GROUP BY word),
         |w AS (SELECT doc_id, lang, source, toks.word,
         |        round(cnt * ln(cast(n.n AS double) / df), 6) AS wgt
         |      FROM toks JOIN dfreq ON toks.word = dfreq.word CROSS JOIN n),
         |norm AS (SELECT doc_id,
         |           cast(sum(cast(wgt * wgt AS decimal(24,8))) AS double) AS n2
         |         FROM w GROUP BY doc_id),
         |wn AS (SELECT w.doc_id, lang, source, word, wgt / sqrt(n2) AS wn
         |       FROM w JOIN norm ON w.doc_id = norm.doc_id),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |        cast(floor(a.wn * b.wn * 1000000000000.0) AS bigint) AS q
         |      FROM wn a JOIN wn b ON a.lang = b.lang AND a.source = b.source
         |        AND a.word = b.word AND a.doc_id < b.doc_id),
         |c AS (SELECT doc_a, doc_b,
         |        round(cast(sum(q) AS double) / 1000000000000.0, 6) AS cos
         |      FROM p GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b, cos FROM c WHERE cos >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin
  )
}
