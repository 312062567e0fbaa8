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
    }
  )

  val oracle: Map[String, String] = Map(
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
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
