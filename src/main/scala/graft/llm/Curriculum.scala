package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 12 batch 2: curriculum staging and corpus-shape census queries —
  * the report surface a training run consults when ordering data by
  * difficulty and sizing sequence-length buckets.
  *
  * Scale shapes: curriculum staging rides [[GraftOps.distributedNtile]]
  * (two-level prefix sum — no single-partition window at any corpus
  * size); the histograms/entropy reduce the corpus with one hash
  * aggregate each and keep all downstream frames dimension-sized.
  */
object Curriculum {

  val queries: Map[String, Q] = Map(

    // curriculum staging: quality-score every document with the SHARED
    // [[Text.qualityScored]] core (same primitive text_quality_score and
    // pipeline_corpus_curation consume — the composed pipeline can't
    // drift from its gates), quartile the corpus on (score, doc_id) via
    // the distributed ntile, and report each stage's document/char mass
    // and score span — the easy→hard schedule a curriculum trainer feeds
    // from. The unique order composite makes the staging deterministic
    // and the ntile kernel keeps it shard-parallel.
    "pipeline_curriculum_stages" -> { (s, dir) =>
      // lazy localCheckpoint: distributedNtile fans `scored` into three
      // plan branches (rank kernel input, join-back side, broadcast count)
      // — without it the full quality-scoring fact scan re-executes per
      // branch (the rfm/pareto discipline)
      val scored = Text.qualityScored(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars"), col("score_e6"))
        .localCheckpoint(false)
      GraftOps.distributedNtile(scored, Seq("score_e6", "doc_id"), 4, "stage")
        .groupBy("stage")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
          min(col("score_e6")).as("score_lo"),
          max(col("score_e6")).as("score_hi"))
        .orderBy("stage")
    },

    // sequence-length census: per source, documents bucketed by the
    // BINARY LENGTH of n_chars (= ⌊log2⌋+1 — exact integer log-bucketing,
    // no float log whose boundary ulps could split engines). The report
    // a packing/batching stage sizes its length buckets from. One
    // aggregate over the corpus; the per-source totals join back
    // broadcast; share in integer micro-units (floor division — round()
    // on ratios lands on cross-engine rounding ties).
    "text_length_histogram_by_source" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents").where(col("n_chars") > 0)
      val h = docs
        .groupBy(col("source"), length(bin(col("n_chars"))).as("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      val tot = docs.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
      h.join(broadcast(tot), "source")
        .select(col("source"), col("bucket"), col("n_docs"),
          col("sum_chars"), expr("n_docs * 1000000 DIV n_total").as("share_e6"))
        .orderBy("source", "bucket")
    },

    // character-trigram entropy per language — the texture signature that
    // separates natural language from degenerate/boilerplate streams
    // (language-ID's n-gram statistics, aggregated to an information
    // measure). The trigram explode is bounded per doc by its length;
    // counts reduce on (lang, gram) in one shuffle and the entropy sum
    // runs over the gram-type table (vocabulary-sized, not corpus-sized).
    // Per-term −p·ln p quantized to DECIMAL(18,12) before the sum (the
    // profile_entropy discipline: the decimal sum is associative, so
    // shard order can't change the total). Gram building is the native
    // codegen [[graft.functions.CharNgrams]] — the interpreted
    // transform/substring HOF chain measured 2.6x slower at sf0.1.
    "text_char_trigram_entropy" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val grams = Tables(s, dir, "documents")
        .where(length(col("text")) >= 3)
        .select(col("lang"), explode(ColumnBridge.column(
          graft.functions.CharNgrams(ColumnBridge.expression(col("text")), 3)))
          .as("gram"))
      val counts = grams.groupBy("lang", "gram").agg(count(lit(1)).as("n"))
      val tot = counts.groupBy("lang")
        .agg(sum(col("n")).as("n_grams"), count(lit(1)).as("n_distinct"))
      counts.join(broadcast(tot), "lang")
        .select(col("lang"), col("n_grams"), col("n_distinct"),
          (col("n").cast(DoubleType) / col("n_grams").cast(DoubleType)).as("p"))
        .groupBy("lang")
        .agg(min(col("n_grams")).as("n_grams"),
          min(col("n_distinct")).as("n_distinct"),
          round(sum((-col("p") * log(col("p"))).cast(DecimalType(18, 12)))
            .cast(DoubleType), 6).as("entropy"))
        .orderBy("lang")
    }
  )

  val oracle: Map[String, String] = Map(
    "pipeline_curriculum_stages" ->
      s"""WITH d AS (SELECT doc_id, n_chars, ${Text.sqlScoreE6} AS score_e6
         |  FROM (${Text.sqlQualityBase})),
         |st AS (SELECT cast(ntile(4) OVER (ORDER BY score_e6, doc_id)
         |    AS int) AS stage, n_chars, score_e6
         |  FROM d)
         |SELECT stage, cast(count(*) AS bigint) AS n_docs,
         |  cast(sum(n_chars) AS bigint) AS n_chars,
         |  min(score_e6) AS score_lo, max(score_e6) AS score_hi
         |FROM st GROUP BY stage ORDER BY stage""".stripMargin,
    "text_length_histogram_by_source" ->
      """WITH d AS (SELECT * FROM documents WHERE n_chars > 0),
        |h AS (SELECT source, cast(length(bin(n_chars)) AS int) AS bucket,
        |    cast(count(*) AS bigint) AS n_docs,
        |    cast(sum(n_chars) AS bigint) AS sum_chars
        |  FROM d GROUP BY 1, 2),
        |tot AS (SELECT source, cast(count(*) AS bigint) AS n_total
        |  FROM d GROUP BY 1)
        |SELECT h.source, bucket, n_docs, sum_chars,
        |  n_docs * 1000000 // n_total AS share_e6
        |FROM h JOIN tot ON h.source = tot.source
        |ORDER BY h.source, bucket""".stripMargin,
    "text_char_trigram_entropy" ->
      """WITH g AS (
        |  SELECT lang, substr(text, cast(t.i AS int), 3) AS gram
        |  FROM documents, unnest(range(1, greatest(length(text) - 2, 0) + 1))
        |    AS t(i)
        |  WHERE length(text) >= 3),
        |ct AS (SELECT lang, gram, count(*) AS n FROM g GROUP BY 1, 2),
        |tot AS (SELECT lang, cast(sum(n) AS bigint) AS n_grams,
        |    cast(count(*) AS bigint) AS n_distinct
        |  FROM ct GROUP BY 1),
        |p AS (SELECT ct.lang, n_grams, n_distinct,
        |    cast(n AS double) / cast(n_grams AS double) AS p
        |  FROM ct JOIN tot ON ct.lang = tot.lang)
        |SELECT lang, min(n_grams) AS n_grams, min(n_distinct) AS n_distinct,
        |  round(cast(sum(cast(-p * ln(p) AS decimal(18,12))) AS double), 6)
        |    AS entropy
        |FROM p GROUP BY lang ORDER BY lang""".stripMargin
  )
}
