package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.12 near-duplicate detection: MinHash-LSH, SimHash, and n-gram-Jaccard
  * verification — the training-data dedup stack.
  *
  * Shingling: word TRIGRAMS. The synthetic corpus draws ~125–450 tokens
  * from a 31-word vocabulary, so unigram sets are identical across docs and
  * even bigram sets saturate at sf0.1 (random-pair Jaccard ≈ 0.25 floods
  * LSH with false candidates). Trigrams (31³ ≈ 30k space) put random pairs
  * at Jaccard ≈ 0.01 while the planted near-dup clusters stay ≈ 0.97 —
  * exactly why real LLM dedup shingles at n≥3.
  *
  * Portability (SURVEY.md §2.12): shingle-ids are an open-vocabulary
  * polynomial string hash ([[graft.functions.StringPolyHash]], mirrored in
  * DuckDB by list_reduce over ord()) — pure map-side, no dictionary state,
  * no global-ORDER window; all downstream hashes are arithmetic
  * (aᵢ·x + bᵢ mod p, p = 2³¹−1) — bit-identical in DuckDB, unlike xxhash64.
  * A same-id shingle collision (~0.2 expected at a 30k vocab, P = 2³¹−1)
  * is reproduced identically by both engines, so the differential gate
  * still holds exactly.
  *
  * Scale & shape: shingles are built array-natively (no window), and the
  * 16 minhashes / 32 simhash component sums are computed in ONE native
  * pass per document over the shingle array (MinHashSig / SimHashVec) —
  * fully map-side, no explode and no per-doc shuffle. Candidate
  * generation is an equi-join on (band|chunk, signature) — quadratic work
  * only inside an LSH bucket. Exact Jaccard is verified ONLY over LSH
  * candidates, via one array_intersect per candidate pair.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1, prime

  /** Word-n-gram shingle ARRAY, map-side (no window), via the native
    * WordNgrams expression — one flat loop instead of an interpreted
    * HOF lambda per shingle. */
  def ngramArray(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.WordNgrams(ColumnBridge.expression(toks), n))
  }

  /** PUBLIC API: distinct (id, bg) word-n-gram shingles of any text column.
    * Per-doc distinct happens array-natively (array_distinct) BEFORE the
    * explode — no global distinct shuffle, (id, bg) unique by construction. */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("__toks", split(lower(col(textCol)), " "))
      .withColumn("__sh", array_distinct(ngramArray(col("__toks"), n)))
      .select(col(idCol).as("doc_id"), explode(col("__sh")).as("bg"))

  /** PUBLIC API: (doc_id, sh) with the n-gram shingle ARRAY kept whole —
    * the preferred input shape for signatures: minhash/simhash read the
    * array in one native pass per document, so nothing is exploded and
    * nothing shuffles until the (band, sig) candidate join.
    * `dedup=true` applies per-doc array_distinct (needed for exact
    * Jaccard sizes/intersections; minhash is duplicate-idempotent). */
  def shingleArrays(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, dedup: Boolean = false): DataFrame = {
    val raw = ngramArray(split(lower(col(textCol)), " "), n)
    df.select(col(idCol).as("doc_id"),
      (if (dedup) array_distinct(raw) else raw).as("sh"))
  }

  private def docArrays(s: SparkSession, dir: String, dedup: Boolean = false): DataFrame =
    shingleArrays(Tables(s, dir, "documents"), "doc_id", "text", 3, dedup)

  /** Every relation Dedup persists is registered here per session, so a
    * long-lived service can reclaim them all with [[clearCaches]] instead
    * of waiting on LRU pressure. */
  private val persistedBySession =
    scala.collection.mutable.Map.empty[SparkSession, scala.collection.mutable.Buffer[DataFrame]]
  private def trackedPersist(df: DataFrame): DataFrame = {
    val p = df.persist()
    persistedBySession.synchronized {
      // registry entries for stopped sessions are unreachable garbage
      // (their blocks died with the context) — drop them here so a
      // create-use-stop session churn can't grow the map unboundedly
      persistedBySession.filterInPlace((s, _) => !s.sparkContext.isStopped)
      persistedBySession.getOrElseUpdate(p.sparkSession,
        scala.collection.mutable.Buffer.empty) += p
    }
    p
  }

  /** PUBLIC API: unpersist every relation the dedup stack cached for
    * `session` — the memoized shingle arrays plus all band-signature /
    * simhash-chunk persists — and drop the memo entries so the next call
    * rebuilds cleanly. Returns the number of relations unpersisted.
    * Long-lived services (a dedup endpoint, a notebook session) call this
    * between corpora; one-shot jobs can let the session teardown reclaim
    * the blocks instead. Lock order matches docArraysCached (daCache →
    * persistedBySession), so a concurrent memoization can never land an
    * entry whose persist this call just revoked. */
  def clearCaches(session: SparkSession): Int = daCache.synchronized {
    daCache.filterInPlace { case ((s, _), _) => s != session }
    persistedBySession.synchronized {
      persistedBySession.remove(session)
        .map { dfs => dfs.foreach(_.unpersist()); dfs.size }
        .getOrElse(0)
    }
  }

  /** Memoized PERSISTED distinct-shingle arrays per (session, dir): the
    * verify path is reached by two declared queries (jaccard, containment)
    * plus every-query sweeps (PlanSpec, Verify, Bench) — per-call persist()
    * registered a fresh cache entry each time that only LRU eviction
    * reclaimed. One persisted copy per (session, dir) instead; reclaim via
    * [[clearCaches]]. */
  private val daCache =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  private[llm] def docArraysCached(s: SparkSession, dir: String): DataFrame =
    daCache.synchronized {
      // same stopped-session hygiene as the persist registry: memo entries
      // for dead sessions pin the session + its analyzed plan forever
      daCache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
      daCache.getOrElseUpdate((s, dir), trackedPersist(docArrays(s, dir, dedup = true)))
    }

  /** shingle string → deterministic id: open-vocab polynomial hash.
    * (The declared queries now hash inside MinHashSig/SimHashVec; this
    * Column form is the composable building block for custom pipelines.) */
  def shingleId(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.StringPolyHash(ColumnBridge.expression(c)))
  }

  /** DuckDB mirror of [[shingleId]] on column `c`. */
  private[llm] def sqlShingleId(c: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(generate_series(1, length($c)), i -> ord(substring($c, i, 1))::BIGINT)),
       |  (a,b) -> (a*31+b) % 2147483647)""".stripMargin

  /** (doc_id, band, sig): the 16 minhashes come from ONE native
    * [[graft.functions.MinHashSig]] pass over the per-doc shingle array —
    * fully map-side (no explode, no groupBy(doc) shuffle), banded 4×4.
    * Values are identical to the exploded h_i(polyhash(bg)) formulation
    * the DuckDB oracle runs (min is duplicate-idempotent). */
  private[llm] def bandSigsFromArrays(da: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val mhs = ColumnBridge.column(
      graft.functions.MinHashSig(ColumnBridge.expression(col("sh"))))
    da.select(col("doc_id"), mhs.as("mhs"))
      .where(col("mhs").isNotNull)
      .select(col("doc_id"), explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          concat_ws(",",
            element_at(col("mhs"), b * 4 + 1), element_at(col("mhs"), b * 4 + 2),
            element_at(col("mhs"), b * 4 + 3), element_at(col("mhs"), b * 4 + 4))
            .as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** PUBLIC API: MinHash-LSH candidate pairs from [[shingleArrays]] shape
    * (doc_id, sh: array<string>); output (doc_a, doc_b, n_bands).
    * The band-sig relation feeds BOTH sides of the self-join, so it is
    * persisted by default — otherwise the whole map-side signature pass
    * runs twice. (Tiny: 4 rows/doc of (id, band, sig). Lifetime: LRU
    * eviction, same policy as the jaccard cache; long-lived services
    * should unpersist.) Callers that invoke this REPEATEDLY on small
    * inputs — e.g. once per streaming micro-batch — pass
    * `persistSigs = false`: the signature pass runs twice but registers
    * nothing with the CacheManager, so nothing accumulates. Persisted
    * sigs are reclaimed by [[clearCaches]]. */
  def candidatesFromArrays(da: DataFrame, persistSigs: Boolean = true): DataFrame = {
    val sigs0 = bandSigsFromArrays(da)
    val sigs = if (persistSigs) trackedPersist(sigs0) else sigs0
    val a = sigs.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig")).where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("band")).as("n_bands"))
  }

  /** PUBLIC API (exploded-shape adapter): candidate pairs over any
    * (doc_id, bg) shingle set from [[shingleSet]] — regroups to arrays
    * (one shuffle), then takes the map-side signature path. */
  def candidatesFrom(sh: DataFrame): DataFrame =
    candidatesFromArrays(
      sh.groupBy(col("doc_id")).agg(collect_list(col("bg")).as("sh")))

  /** candidate pairs: docs sharing ≥1 LSH band, with matching-band count. */
  private[llm] def candidates(s: SparkSession, dir: String): DataFrame =
    candidatesFromArrays(docArrays(s, dir))

  /** SQL mirror of the shingle→minhash→band chain (shared CTE prefix). */
  private[llm] val sqlBands =
    s"""pos AS (SELECT doc_id,
      |  unnest(string_split(lower(text), ' ')) AS word,
      |  generate_subscripts(string_split(lower(text), ' '), 1) AS pos FROM documents),
      |sh AS (SELECT DISTINCT doc_id, bg FROM (
      |  SELECT doc_id, word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w AS bg
      |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)) WHERE bg IS NOT NULL),
      |dict AS (SELECT bg, ${sqlShingleId("bg")} AS tid
      |         FROM (SELECT DISTINCT bg FROM sh)),
      |mh AS (SELECT doc_id, i, min(((2*i+3) * tid + 5*i+7) % 2147483647) AS mh
      |       FROM sh JOIN dict USING (bg) CROSS JOIN range(16) r(i)
      |       GROUP BY doc_id, i),
      |sigs AS (SELECT doc_id, cast(i // 4 as int) AS band,
      |  concat_ws(',',
      |    min(CASE WHEN i % 4 = 0 THEN mh END),
      |    min(CASE WHEN i % 4 = 1 THEN mh END),
      |    min(CASE WHEN i % 4 = 2 THEN mh END),
      |    min(CASE WHEN i % 4 = 3 THEN mh END)) AS sig
      |  FROM mh GROUP BY doc_id, 2),
      |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(DISTINCT a.band) AS n_bands
      |         FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
      |          AND a.doc_id < b.doc_id
      |         GROUP BY 1, 2)""".stripMargin

  /** shared Jaccard score shape: |A∩B| / |A∪B| over (common, |A|, |B|). */
  private val jaccardScore: (Column, Column, Column) => Column =
    (common, na, nb) => common.cast("double") / (na + nb - common)

  /** PUBLIC API: end-to-end corpus dedup — LSH candidates → exact n-gram
    * Jaccard verify ≥ `threshold` → connected components → keep ONE doc
    * per cluster (the min id: deterministic canonical) and drop the rest.
    * This is the operation a training pipeline actually runs; the pieces
    * (candidates / verify / clusters) stay public for inspection flows.
    * The corpus itself is never shuffled or widened: losers arrive via a
    * left_anti join on the id (AQE broadcasts them while small; at 100 TB
    * the anti-join shuffles on the id — still corpus-linear).
    *
    * The shingle arrays feed both the signature pass and the verify join,
    * so they persist by default; `persistArrays = false` (paired with
    * `persistSigs = false` downstream) makes the call register NOTHING
    * with the CacheManager — the shape for per-micro-batch callers.
    * Persisted arrays are reclaimed by [[clearCaches]]. */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, persistArrays: Boolean = true): DataFrame = {
    val da0 = shingleArrays(df, idCol, textCol, n, dedup = true)
    val da = if (persistArrays) trackedPersist(da0) else da0
    df.join(
      selfDedupLosers(da, threshold, persistSigs = persistArrays)
        .withColumnRenamed("doc_id", idCol),
      Seq(idCol), "left_anti")
  }

  /** PUBLIC API (array-shape kernel of [[dedupCorpus]]): the doc_ids to
    * DROP so one min-id doc survives per near-dup cluster of `da`
    * ([[shingleArrays]] dedup=true shape). The one definition of the
    * candidates → jaccard-verify → components → losers policy — the
    * declared keep-canonical query and the streaming self-dedup both
    * enter here. `persistSigs=false` for repeated small-input callers
    * (see [[candidatesFromArrays]]). */
  def selfDedupLosers(da: DataFrame, threshold: Double,
      persistSigs: Boolean = true): DataFrame = {
    val verified = verifyCandidates(da, candidatesFromArrays(da, persistSigs),
      "jaccard", threshold, jaccardScore)
    connectedComponents(
        verified.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b")
      .where(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_minhash" -> { (s, dir) =>
      candidates(s, dir).orderBy(col("doc_a"), col("doc_b"))
    },

    // the end-to-end dedup: jaccard-verified pairs → transitive clusters →
    // keep the min-id doc per cluster, anti-join the losers out. Declared
    // over the session-cached shingle arrays (same memoized pass the
    // jaccard/containment queries use).
    "dedup_keep_canonical" -> { (s, dir) =>
      Tables(s, dir, "documents").select(col("doc_id"))
        .join(selfDedupLosers(docArraysCached(s, dir), 0.3),
          Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    },

    // 32-bit SimHash over tf-weighted trigram shingles; candidates share ≥1
    // of 4 8-bit chunks (pigeonhole for hamming ≤ 3), verified with exact
    // bit_count(xor). The 32 component sums come from ONE native SimHashVec
    // pass over the RAW shingle array (iterating duplicates IS the tf
    // weighting) — map-side, no explode, no groupBy(doc,bg) shuffle.
    "dedup_simhash" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val vv = ColumnBridge.column(
        graft.functions.SimHashVec(ColumnBridge.expression(col("sh"))))
      val withVec = docArrays(s, dir)
        .select(col("doc_id"), vv.as("vv"))
        .where(col("vv").isNotNull)
      val sbit = (0 until 32).map(j =>
        when(element_at(col("vv"), j + 1) > 0, 1L).otherwise(0L))
      val simCols: Seq[Column] =
        col("doc_id") +:
          (0 until 32).map(j => shiftleft(sbit(j), j)).reduce(_ + _).as("simhash") +:
          (0 until 4).map { c =>
            (0 until 8).map(k => shiftleft(sbit(c * 8 + k), k)).reduce(_ + _)
              .as(s"cval$c")
          }
      val sims = withVec.select(simCols: _*)
      // both self-join sides read `chunks` — persist so the map-side
      // SimHashVec pass runs once (reclaimed by clearCaches, same policy
      // as the minhash band sigs)
      val chunks = trackedPersist(sims.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(c =>
          struct(lit(c).as("c"), col(s"cval$c").as("cval"))): _*)).as("ch"))
        .select(col("doc_id"), col("simhash"), col("ch.c").as("c"), col("ch.cval").as("cval")))
      val ca = chunks.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
        col("c"), col("cval"))
      val cb = chunks.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"),
        col("c"), col("cval"))
      ca.join(cb, Seq("c", "cval")).where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("cast(bit_count(sim_a ^ sim_b) as int)").as("hamming"))
        .distinct()
        .where(col("hamming") <= 3)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // exact trigram Jaccard, verified ONLY over MinHash-LSH candidates.
    // The per-doc DISTINCT shingle arrays feed both the signatures and the
    // verification: candidate pairs pull the two arrays back via unhinted
    // joins (AQE broadcasts the LSH-small candidate side at runtime; at
    // 100 TB the same plan degrades to shuffle joins) and the intersection
    // size is one native array_intersect per pair — no exploded shingle
    // join at all. The arrays are persisted ONCE per (session, dir)
    // (docArraysCached); long-lived services should unpersist.
    "dedup_ngram_jaccard" -> { (s, dir) =>
      verifiedPairs(s, dir, "jaccard", 0.3,
        (common, na, nb) => common.cast("double") / (na + nb - common))
    },

    // top-k similarity SEARCH over the same LSH machinery (the EDBT
    // top-k similarity-search shape, PAPERS.md): instead of a fixed
    // threshold, the 20 most-similar candidate pairs globally —
    // verify-then-TakeOrderedAndProject, ordering on the ROUND-6 score
    // (both engines order the identical rounded doubles; (doc_a, doc_b)
    // breaks ties). Candidates still come from the bucketed LSH join,
    // so the pair population never approaches all-pairs at any scale.
    "sim_topk_pairs" -> { (s, dir) =>
      val da = docArraysCached(s, dir)
      val cand = candidatesFromArrays(da)
      verifyCandidates(da, cand, "jaccard", 0.0,
        (common, na, nb) => common.cast("double") / (na + nb - common))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(20)
    },

    // CONTAINMENT dedup: |A∩B| / min(|A|,|B|) — catches a document that is
    // a near-SUBSET of another (boilerplate-wrapped copies, excerpt pages),
    // which Jaccard misses because the size imbalance dilutes the union.
    // Same LSH candidate machinery and per-pair array_intersect as the
    // jaccard verify; only the denominator and threshold change.
    "dedup_containment" -> { (s, dir) =>
      verifiedPairs(s, dir, "containment", 0.5,
        (common, na, nb) => common.cast("double") / least(na, nb))
    },

    // Transitive dedup CLUSTERS over the MinHash-LSH candidate pairs:
    // pairs say "a~b"; dedup keeps one doc per connected component, so the
    // engine needs components, not pairs (see [[connectedComponents]]).
    "dedup_cluster_cc" -> { (s, dir) =>
      val pairs = candidates(s, dir).select(col("doc_a"), col("doc_b"))
      connectedComponents(pairs, "doc_a", "doc_b")
        .groupBy(col("component").as("cluster_rep"))
        .agg(count(lit(1)).as("n_docs"), max(col("node")).as("max_doc"),
          sum(col("node")).as("sum_docs"))
        .orderBy(col("cluster_rep"))
    }
  )

  /** PUBLIC API: exact set-overlap verification of candidate pairs against
    * per-doc DISTINCT shingle arrays (`da` in [[shingleArrays]] shape with
    * dedup=true, `cand` as (doc_a, doc_b)): one `array_intersect` per
    * candidate, scored by `score(common, |A|, |B|)` (Jaccard, containment,
    * …), rounded to 6 and thresholded.
    *
    * Join strategy is deliberately UNHINTED: at bench scale AQE broadcasts
    * the LSH-small candidate side at runtime (PlanSpec asserts the final
    * adaptive plan does), and at an adversarial 100 TB — candidate set too
    * big for any broadcast ceiling — the SAME code degrades to shuffle
    * joins on doc_id with the shingle arrays carried once each, instead of
    * OOMing the driver on a hardcoded broadcast() hint. */
  def verifyCandidates(da: DataFrame, cand: DataFrame, scoreName: String,
      threshold: Double, score: (Column, Column, Column) => Column): DataFrame = {
    val withA = da.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val withB = da.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    withB.join(withA.join(cand.select(col("doc_a"), col("doc_b")), "doc_a"), "doc_b")
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn(scoreName,
        round(score(col("common"), size(col("sha")), size(col("shb"))), 6))
      .where(col(scoreName) >= threshold)
      .select(col("doc_a"), col("doc_b"), col(scoreName))
  }

  /** declared-query wrapper: memoized arrays → LSH candidates → verify. */
  private def verifiedPairs(s: SparkSession, dir: String, scoreName: String,
      threshold: Double, score: (Column, Column, Column) => Column): DataFrame = {
    val da = docArraysCached(s, dir)
    val cand = candidatesFromArrays(da)
    verifyCandidates(da, cand, scoreName, threshold, score)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB mirror of [[verifiedPairs]] — shared sizes/common CTEs, the
    * score expression injected over (coalesce(m.common,0), sa.nbg, sb.nbg). */
  private def sqlVerifiedPairs(scoreName: String, scoreExpr: String,
      threshold: String): String =
    s"""WITH $sqlBands,
       |sizes AS (SELECT doc_id, count(*) AS nbg FROM sh GROUP BY doc_id),
       |common AS (SELECT c.doc_a, c.doc_b, count(*) AS common
       |  FROM cand c JOIN sh ba ON ba.doc_id = c.doc_a
       |  JOIN sh bb ON bb.doc_id = c.doc_b AND ba.bg = bb.bg
       |  GROUP BY 1, 2)
       |SELECT c.doc_a, c.doc_b, round($scoreExpr, 6) AS $scoreName
       |FROM cand c LEFT JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
       |JOIN sizes sa ON sa.doc_id = c.doc_a
       |JOIN sizes sb ON sb.doc_id = c.doc_b
       |WHERE round($scoreExpr, 6) >= $threshold
       |ORDER BY c.doc_a, c.doc_b""".stripMargin

  /** PUBLIC API: connected components of an undirected pair/edge list —
    * output (node, component) where component = min node id reachable.
    * Min-label propagation with per-round PATH COMPRESSION (lab ← lab(lab)),
    * so convergence needs ~log₂(diameter) rounds, not diameter — a 2²⁰-hop
    * chain fits the default budget. Each round is two equi-joins + a hash
    * agg, all scale-out shuffles on node id; the only driver-side value per
    * round is the "did any label change" boolean — the standard
    * iterative-algorithm convergence scalar, not a data collect. Throws if
    * the round budget is exhausted rather than returning split components
    * (maxRounds counts the fused init plus at least one confirm round, so
    * it must be ≥ 2). Checkpointing (required — the compression self-join
    * doubles the logical plan per round): by default LOCAL, which is fast
    * but not recomputable after executor loss; pass `checkpointDir` (an
    * HDFS/object-store path on a cluster) to switch every round to
    * reliable `DataFrame.checkpoint` — the fault-tolerant mode a 100 TB
    * run needs, same call shape, verified by PropertiesSpec. Per-round
    * label copies are node-sized and reclaimed by the ContextCleaner
    * as each round's reference is dropped; edges are unpersisted here even
    * on failure.
    *
    * `algorithm`: `"auto"` (default), `"labelprop"` — min-label
    * propagation with path compression; the right shape for dedup graphs,
    * whose components are near-cliques that converge in ~2 rounds — or
    * `"two-phase"` — the alternating large-star/small-star edge
    * contraction of Kiveris et al. (MapReduce CC, "The Alternating
    * Algorithm"), which guarantees O(log n) ROUNDS on any graph and —
    * unlike label propagation, which carries a (node → label) row for
    * EVERY node through EVERY round — shrinks the edge set as it
    * contracts, so adversarial long-chain / high-diameter graphs don't
    * degrade. `"auto"` runs labelprop with a small round budget
    * ([[AutoLabelPropRounds]] — covers every dedup-shaped graph and any
    * diameter ≲ 2⁶) and, if that budget is exhausted without convergence,
    * RESTARTS on two-phase with the full `maxRounds` — so callers get
    * labelprop's cheap rounds on typical graphs and two-phase's O(log n)
    * bound on adversarial ones without choosing up front. Same output
    * contract for all three.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 20, checkpointDir: Option[String] = None,
      algorithm: String = "auto"): DataFrame = algorithm match {
    case "auto" =>
      // wasted-work bound on fallback: AutoLabelPropRounds node-sized
      // rounds (the graphs that defeat labelprop are long chains, whose
      // per-round cost is small precisely because components are thin)
      labelPropOpt(pairs, aCol, bCol,
          math.max(2, math.min(maxRounds, AutoLabelPropRounds)), checkpointDir)
        .getOrElse(
          connectedComponentsTwoPhase(pairs, aCol, bCol, maxRounds, checkpointDir))
    case "labelprop" =>
      labelPropOpt(pairs, aCol, bCol, maxRounds, checkpointDir).getOrElse(
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxRounds rounds"))
    case "two-phase" =>
      connectedComponentsTwoPhase(pairs, aCol, bCol, maxRounds, checkpointDir)
    case other => throw new IllegalArgumentException(
      s"unknown CC algorithm '$other' (auto | labelprop | two-phase)")
  }

  /** labelprop round budget the AUTO path spends before switching to
    * two-phase: path compression converges in ~log₂(diameter) rounds, so
    * 6 rounds cover any diameter ≲ 2⁶ — far beyond any dedup graph. */
  val AutoLabelPropRounds = 6

  /** min-label propagation; None = round budget exhausted WITHOUT
    * convergence (never a partially-converged labeling). */
  private def labelPropOpt(pairs: DataFrame, aCol: String,
      bCol: String, maxRounds: Int, checkpointDir: Option[String]): Option[DataFrame] = {
    require(maxRounds >= 2, "maxRounds must be >= 2 (init + one confirm round)")
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def save(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // r15 (guide §2.4 — same-keyed ops share one exchange): every round
    // joins `edges` on src, and the init aggregate groups by src; persist
    // the edge list ALREADY hash-partitioned and sorted by src, so the
    // per-round SortMergeJoin re-shuffles and re-sorts only the
    // node-sized labels side — the edge-scale exchange+sort is paid once
    // at cache materialization instead of once per round (the cached
    // relation's partitioning/ordering are preserved by persist).
    val edges = p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .persist()
    // fused round 1: lab₀ = min(node, min neighbor) straight off the edge
    // list — one agg instead of join+union+agg, and dedup graphs (cliques)
    // usually converge here, leaving the loop a single confirm round.
    // checkpoint (not persist) each round: the compression SELF-join
    // doubles the logical plan per round, so without lineage truncation the
    // driver-side plan grows 2^rounds — checkpointing keeps it flat
    // (local by default; reliable when checkpointDir is set).
    var labels = save(
      edges.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src").as("node"), least(col("mn"), col("src")).as("lab")))
    var done = false
    var rounds = 1
    try {
      while (!done && rounds < maxRounds) {
        // carry each node's PREVIOUS label through the fused agg (labels
        // contributes exactly one row per node, prop rows carry null, so
        // max(__old) is that previous label — no extra join): the
        // convergence signal rides the SAME checkpointed pass, and the
        // per-round "did anything change" check becomes a filter over
        // already-materialized blocks instead of a second node⋈node join
        // job. Local sf0.1 wall-clock is unchanged (noise-dominated; both
        // shapes measure 2.1–2.8 s warm), but per round this drops one
        // node-sized shuffle join — the structural win at cluster scale,
        // where the convergence check was half the per-round shuffles.
        val labT = labels.schema("lab").dataType
        val prop = edges.join(labels, edges("src") === labels("node"))
          .select(col("dst").as("node"), col("lab"),
            lit(null).cast(labT).as("__old"))
        val fused = labels.select(col("node"), col("lab"), col("lab").as("__old"))
          .unionByName(prop)
          .groupBy(col("node"))
          .agg(min(col("lab")).as("lab"), max(col("__old")).as("__old"))
        // compression: every label is itself a node, so lab(lab) exists and
        // lab(lab) ≤ lab — following one extra hop halves chain depth.
        // (r14 note: a second compression hop per round — pointer
        // doubling — was tried and measured SLOWER on the co-purchase
        // giant, 5.86 s vs 3.48 s: convergence is propagation-bound, not
        // chain-depth-bound, so the extra join was pure overhead.)
        val byLab = fused.select(col("node").as("ln"), col("lab").as("lab2"))
        // r15: LAZY local checkpoint + a count aggregate as the
        // materializing action — the convergence scalar rides the SAME
        // job that persists the round's blocks, so each round is ONE job
        // instead of two (checkpoint job + isEmpty scan). Reliable
        // checkpoints (checkpointDir set) stay EAGER: a lazily-checkpointed
        // reliable RDD is recomputed once more when the checkpoint files
        // are written, which would cost a round, not save one.
        val nextPlan = fused.join(byLab, fused("lab") === byLab("ln"))
          .select(fused("node"), col("lab2").as("lab"),
            (col("lab2") < col("__old")).as("__chg"))
        val next =
          if (checkpointDir.isDefined) nextPlan.checkpoint()
          else nextPlan.localCheckpoint(false)
        done = next.agg(count(when(col("__chg"), lit(1)))).head.getLong(0) == 0L
        labels = next.select(col("node"), col("lab"))
        rounds += 1
      }
    } finally edges.unpersist()
    if (done) Some(labels.select(col("node"), col("lab").as("component")))
    else None
  }

  /** Alternating large-star/small-star CC (Kiveris et al., public
    * MapReduce-CC literature). Edges are kept CANONICAL (u > v) and each
    * round rewrites them:
    *
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(Γ(u) ∪ {u}) — emit (v, m);
    *  - small-star(u): all smaller neighbors (and u itself) attach to
    *    m = min(Γ⁻(u) ∪ {u}) — emit (u, m) and (v, m) for v ∈ Γ⁻(u)\{m}.
    *
    * The fixed point is one star per component centered at its min node,
    * reached in O(log n) alternating rounds on ANY graph — including the
    * long-chain adversary where plain label propagation pays diameter
    * rounds. Convergence check: a (count, sum-of-edge-hashes) signature
    * per round — two driver scalars, no data collect — CONFIRMED by an
    * exact `except` both ways before returning (a signature collision can
    * therefore never return split components; it would only cost one
    * wasted confirm). Per-round checkpointing and the reliable-vs-local
    * choice follow the label-prop path exactly. */
  private def connectedComponentsTwoPhase(pairs: DataFrame, aCol: String,
      bCol: String, maxRounds: Int, checkpointDir: Option[String]): DataFrame = {
    require(maxRounds >= 2, "maxRounds must be >= 2")
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def save(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    val p = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
    // nodes remembered up front: edge contraction erases singleton
    // components (self-pairs) and, at the end, star centers — both must
    // still appear in the output with component = min reachable (= self
    // for singletons, = the center id for centers).
    val nodes = save(
      p.select(col("a").as("node")).unionByName(p.select(col("b").as("node")))
        .distinct())
    var edges = save(
      p.where(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .distinct())
    // hash sum as decimal(38,0): a long sum overflow-faults under ANSI
    def signature(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }
    var sig = signature(edges)
    var done = sig._1 == 0L // count rides the signature — no extra job
    var rounds = 0
    while (!done && rounds < maxRounds) {
      // LARGE-STAR over the full adjacency (both directions); the result
      // feeds both small-star aggregations, so persist it for the round
      val adj = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      val mins = adj.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val ls = adj.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v")).distinct()
        .persist()
      try {
        // SMALL-STAR on the canonical (u > v) edges
        val mins2 = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
        val withM = ls.join(mins2, "u")
        val next = save(
          withM.select(col("v").as("u"), col("m").as("v"))
            .where(col("u") =!= col("v"))
            .unionByName(mins2.select(col("u"), col("m").as("v")))
            .distinct())
        val nextSig = signature(next)
        if (nextSig == sig) {
          // exact confirm — immunizes against a signature collision
          done = next.exceptAll(edges).isEmpty && edges.exceptAll(next).isEmpty
        }
        sig = nextSig
        edges = next
      } finally ls.unpersist()
      rounds += 1
    }
    require(done, s"two-phase CC did not converge in $maxRounds rounds")
    // stars: (leaf u → center v); centers and singletons label themselves
    nodes
      .join(edges.select(col("u").as("node"), col("v").as("component")),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  val oracle: Map[String, String] = Map(
    "dedup_minhash" ->
      s"""WITH $sqlBands
         |SELECT doc_a, doc_b, n_bands FROM cand ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_keep_canonical" ->
      s"""WITH RECURSIVE $sqlBands,
         |sizes AS (SELECT doc_id, count(*) AS nbg FROM sh GROUP BY doc_id),
         |common AS (SELECT c.doc_a, c.doc_b, count(*) AS common
         |  FROM cand c JOIN sh ba ON ba.doc_id = c.doc_a
         |  JOIN sh bb ON bb.doc_id = c.doc_b AND ba.bg = bb.bg
         |  GROUP BY 1, 2),
         |vp AS (SELECT c.doc_a, c.doc_b
         |  FROM cand c LEFT JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
         |  JOIN sizes sa ON sa.doc_id = c.doc_a
         |  JOIN sizes sb ON sb.doc_id = c.doc_b
         |  WHERE round(cast(coalesce(m.common, 0) as double)
         |          / (sa.nbg + sb.nbg - coalesce(m.common, 0)), 6) >= 0.3),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM vp
         |          UNION ALL SELECT doc_b, doc_a FROM vp),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
         |losers AS (SELECT node FROM (SELECT node, min(lab) AS lab FROM reach GROUP BY node)
         |           WHERE lab <> node)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT node FROM losers)
         |ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      s"""WITH pos AS (SELECT doc_id,
        |  unnest(string_split(lower(text), ' ')) AS word,
        |  generate_subscripts(string_split(lower(text), ' '), 1) AS pos FROM documents),
        |tf AS (SELECT doc_id, bg, count(*) AS tf FROM (
        |  SELECT doc_id, word || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w AS bg
        |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)) WHERE bg IS NOT NULL
        |  GROUP BY 1, 2),
        |dict AS (SELECT bg, ${sqlShingleId("bg")} AS tid
        |         FROM (SELECT DISTINCT bg FROM tf)),
        |bits AS (SELECT doc_id, j,
        |    CASE WHEN sum(tf * (((((tid * 737 + 97) % 2147483647) >> j) & 1) * 2 - 1)) > 0
        |         THEN 1::bigint ELSE 0::bigint END AS sbit
        |  FROM tf JOIN dict USING (bg) CROSS JOIN range(32) r(j)
        |  GROUP BY doc_id, j),
        |sims AS (SELECT doc_id, cast(sum(sbit << j) as bigint) AS simhash FROM bits GROUP BY doc_id),
        |chunks AS (SELECT doc_id, cast(j // 8 as int) AS c, cast(sum(sbit << (j % 8)) as bigint) AS cval
        |           FROM bits GROUP BY doc_id, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM chunks a JOIN chunks b ON a.c = b.c AND a.cval = b.cval
        |          AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, cast(bit_count(xor(sa.simhash, sb.simhash)) as int) AS hamming
        |FROM cand JOIN sims sa ON cand.doc_a = sa.doc_id
        |JOIN sims sb ON cand.doc_b = sb.doc_id
        |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_ngram_jaccard" -> sqlVerifiedPairs("jaccard",
      "cast(coalesce(m.common, 0) as double) / (sa.nbg + sb.nbg - coalesce(m.common, 0))",
      "0.3"),
    "sim_topk_pairs" -> {
      val scoreExpr =
        "cast(coalesce(m.common, 0) as double) / (sa.nbg + sb.nbg - coalesce(m.common, 0))"
      s"""WITH $sqlBands,
         |sizes AS (SELECT doc_id, count(*) AS nbg FROM sh GROUP BY doc_id),
         |common AS (SELECT c.doc_a, c.doc_b, count(*) AS common
         |  FROM cand c JOIN sh ba ON ba.doc_id = c.doc_a
         |  JOIN sh bb ON bb.doc_id = c.doc_b AND ba.bg = bb.bg
         |  GROUP BY 1, 2)
         |SELECT c.doc_a, c.doc_b, round($scoreExpr, 6) AS jaccard
         |FROM cand c LEFT JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
         |JOIN sizes sa ON sa.doc_id = c.doc_a
         |JOIN sizes sb ON sb.doc_id = c.doc_b
         |ORDER BY jaccard DESC, c.doc_a, c.doc_b LIMIT 20""".stripMargin
    },
    "dedup_containment" -> sqlVerifiedPairs("containment",
      "cast(coalesce(m.common, 0) as double) / least(sa.nbg, sb.nbg)",
      "0.5"),
    "dedup_cluster_cc" ->
      s"""WITH RECURSIVE $sqlBands,
         |pr AS (SELECT doc_a, doc_b FROM cand),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
         |          UNION ALL SELECT doc_b, doc_a FROM pr),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node),
         |labs AS (SELECT node, min(lab) AS lab FROM reach GROUP BY node)
         |SELECT lab AS cluster_rep, count(*) AS n_docs, max(node) AS max_doc,
         |  cast(sum(node) AS bigint) AS sum_docs
         |FROM labs GROUP BY lab ORDER BY cluster_rep""".stripMargin
  )
}
