package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** Composed training-data curation pipelines — the end-to-end queries a
  * corpus curator actually runs, declared and oracle-checked like every
  * primitive operator.
  *
  * `pipeline_corpus_curation` chains three §2.12 stages in ONE Catalyst
  * plan: quality scoring (map-side) → MinHash-LSH near-dup loser removal
  * (map-side signatures + the small band join, then a left_anti against
  * the loser set) → per-language corpus stats. At 100 TB the anti-join
  * side (near-dup losers) is LSH-small, so Spark broadcasts it; nothing
  * else shuffles beyond the stats aggregation.
  *
  * `sample_stratified` is deterministic mixture downsampling: arithmetic
  * key-mod sampling with a per-stratum rate (20% for `en`, 10% for the
  * rest) — reproducible across engines/retries, unlike TABLESAMPLE, and
  * the standard lever for rebalancing a training mixture.
  *
  * `split_train_test` assigns every document to train/valid/test by a
  * deterministic arithmetic hash of its key (80/10/10) — pure map-side,
  * content-stable across retries and engines, the standard way to split a
  * corpus so the assignment never moves when the table is re-partitioned.
  * The multiplier is applied to `doc_id % 100003` so the int64 product
  * can't overflow for any key (both engines error or wrap differently on
  * 64-bit overflow, so bounded inputs are part of the contract).
  *
  * `pipeline_shuffle_deterministic` is the reproducible corpus shuffle
  * every training run needs before packing: a seeded arithmetic hash of
  * the key is the permutation order, so the shuffle is identical across
  * engines, retries, and re-partitioning (`ORDER BY rand()` is none of
  * those). At 100 TB the global ORDER BY is a sample-based
  * range-partitioned sort — the canonical distributed-shuffle shape:
  * sort by the hash, write partitioned, and the trainer streams
  * shards in order. Ties (hash collisions) break on the key itself, so
  * the order is total and the oracle can mirror it row-for-row.
  *
  * `text_pii_scrub` is the PII-redaction stage of a curation pipeline:
  * regex scrub of emails / phone numbers to placeholder tokens, counting
  * redactions per document. The synthetic corpus contains no PII, so the
  * query injects deterministic markers keyed on doc_id first — the scrub
  * logic itself (Java regex on the Spark side, RE2 in DuckDB; patterns
  * chosen inside the common dialect) is what the oracle checks.
  */
object Pipeline {

  val queries: Map[String, Q] = Map(
    "pipeline_corpus_curation" -> { (s, dir) =>
      // the quality stage IS text_quality_score's core (Text.qualityScored)
      // — one definition, so the composed pipeline can't drift from the
      // primitive it chains
      val quality = Text.qualityScored(Tables(s, dir, "documents"))
      val losers = Dedup.candidates(s, dir)
        .select(col("doc_b").as("doc_id")).distinct()
      quality.where(col("score_e6") >= 950000L)
        // the loser set is LSH-small — broadcast the anti-join so the
        // corpus never shuffles (static plan was a SortMergeJoin LeftAnti
        // sorting every document against ~10² losers)
        .join(broadcast(losers), Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    },

    "sample_stratified" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .where(when(col("lang") === "en", col("doc_id") % 5 === 0)
          .otherwise(col("doc_id") % 10 === 0))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))
    },

    "split_train_test" -> { (s, dir) =>
      val bucket = pmod((col("doc_id") % 100003L) * 1103515245L + 12345L,
        lit(1000L))
      Tables(s, dir, "documents")
        .withColumn("split",
          when(bucket < 800, "train").when(bucket < 900, "valid")
            .otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("split"))
    },

    // deterministic source interleaving: the training order that takes
    // documents round-robin across sources (rank-1 of every source,
    // then rank-2, …) — the mixing that keeps any single source from
    // monopolizing a training window. Both levels ride the distributed
    // kernels: per-source rank via the source-keyed prefix sum (a
    // source's docs never funnel through one task), global position via
    // distributedRank over (rank, source).
    "pipeline_interleave_sources" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id")).withColumn("one", lit(1L))
      val ranked = graft.GraftOps.distributedRunningSum(
        d, "source", "doc_id", "one", "r")
      graft.GraftOps.distributedRank(ranked, Seq("r", "source"), "pos")
        .select(col("doc_id"), col("source"), col("r"), col("pos"))
        .orderBy("doc_id")
    },

    "pipeline_shuffle_deterministic" -> { (s, dir) =>
      // seeded LCG over the bounded key (same overflow contract as
      // split_train_test); modulus ≠ multiplier period → real scatter.
      // sign-of-dividend % on BOTH engines (not pmod): identical keys
      // even if a source ever carries negative ids
      val h = ((col("doc_id") % 100003L) * 48271L + 11L) % 99991L
      Tables(s, dir, "documents")
        .select(col("doc_id"), h.as("shuffle_key"))
        .orderBy(col("shuffle_key"), col("doc_id"))
    },

    "text_pii_scrub" -> { (s, dir) =>
      val email = "[a-z0-9]+@[a-z]+\\.com"
      val phone = "555-[0-9]{4}"
      val raw = concat(col("text"),
        when(col("doc_id") % 3 =!= 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit(" ph 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      Tables(s, dir, "documents")
        .withColumn("raw", raw)
        .select(
          col("doc_id"),
          (regexp_count(col("raw"), lit(email)) +
            regexp_count(col("raw"), lit(phone))).cast("long").as("n_pii"),
          length(regexp_replace(regexp_replace(col("raw"), email, "[EMAIL]"),
            phone, "[PHONE]")).cast("long").as("clean_len"))
        .orderBy(col("doc_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "pipeline_interleave_sources" ->
      """WITH r AS (SELECT doc_id, source,
        |    cast(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |      AS bigint) AS r
        |  FROM documents)
        |SELECT doc_id, source, r,
        |  cast(row_number() OVER (ORDER BY r, source) AS bigint) AS pos
        |FROM r ORDER BY doc_id""".stripMargin,
    "pipeline_corpus_curation" ->
      s"""WITH ${Dedup.sqlBands},
         |losers AS (SELECT DISTINCT doc_b AS doc_id FROM cand),
         |q AS (${Text.sqlQualityBase}),
         |kept AS (SELECT doc_id, lang, n_chars FROM q
         |  WHERE ${Text.sqlScoreE6} >= 950000
         |    AND doc_id NOT IN (SELECT doc_id FROM losers))
         |SELECT lang, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS sum_chars
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, count(*) AS n_docs,
        |cast(sum(n_chars) as bigint) AS sum_chars,
        |cast(sum(doc_id) as bigint) AS sum_ids
        |FROM documents
        |WHERE CASE WHEN lang = 'en' THEN doc_id % 5 = 0 ELSE doc_id % 10 = 0 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "split_train_test" ->
      """WITH b AS (
        |  SELECT n_chars,
        |    ((cast(doc_id AS bigint) % 100003) * 1103515245 + 12345) % 1000
        |      AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 800 THEN 'train'
        |            WHEN bucket < 900 THEN 'valid' ELSE 'test' END AS split,
        |  count(*) AS n_docs, cast(sum(n_chars) AS bigint) AS sum_chars
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "pipeline_shuffle_deterministic" ->
      """SELECT doc_id,
        |  ((cast(doc_id AS bigint) % 100003) * 48271 + 11) % 99991
        |    AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH raw AS (
        |  SELECT doc_id, concat(text,
        |    CASE WHEN doc_id % 3 <> 0 THEN concat(' contact user',
        |      cast(doc_id AS varchar), '@example.com') ELSE '' END,
        |    CASE WHEN doc_id % 2 = 0 THEN concat(' ph 555-',
        |      lpad(cast(doc_id % 10000 AS varchar), 4, '0')) ELSE '' END)
        |    AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(raw, '[a-z0-9]+@[a-z]+\.com'))
        |    + len(regexp_extract_all(raw, '555-[0-9]{4}')) AS n_pii,
        |  length(regexp_replace(regexp_replace(raw,
        |    '[a-z0-9]+@[a-z]+\.com', '[EMAIL]', 'g'),
        |    '555-[0-9]{4}', '[PHONE]', 'g')) AS clean_len
        |FROM raw ORDER BY doc_id""".stripMargin
  )
}
