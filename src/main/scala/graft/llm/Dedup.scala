package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.12 near-duplicate detection: MinHash-LSH, SimHash, and n-gram-Jaccard
  * verification — the training-data dedup stack.
  *
  * Shingling: word BIGRAMS, not unigrams — the synthetic corpus draws ~125
  * tokens from a 31-word vocabulary, so unigram token sets are identical
  * across almost all docs (degenerate for set similarity); bigram sets
  * (31² space) discriminate properly. This mirrors real LLM dedup, which
  * shingles at n≥3 words for exactly this reason.
  *
  * Portability (SURVEY.md §2.12): shingle-ids come from a dictionary built
  * with row_number over sorted distinct shingles; all hashes are arithmetic
  * (aᵢ·x + bᵢ mod p, p = 2³¹−1) — bit-identical in DuckDB, unlike xxhash64.
  *
  * Scale: every stage is explode → hash-agg → equi-join on (band|chunk,
  * signature); the quadratic step only happens inside an LSH bucket. Exact
  * Jaccard is verified ONLY over LSH candidates, never all pairs.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1, prime

  /** distinct (doc_id, bg) word-bigram shingles. */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    val pos = Tables(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("pos", "word")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    pos.withColumn("next", lead(col("word"), 1).over(w))
      .where(col("next").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("word"), col("next")).as("bg"))
      .distinct()
  }

  /** shingle → dense deterministic id (1-based, sorted order). */
  private def dict(sh: DataFrame): DataFrame =
    sh.select(col("bg")).distinct()
      .withColumn("tid", row_number().over(Window.orderBy(col("bg"))).cast("long"))

  /** 16 minhashes per doc: h_i(tid) = ((2i+3)·tid + 5i+7) mod p. */
  private def minhashes(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    sh.join(broadcast(dict(sh)), "bg")
      .withColumn("i", explode(sequence(lit(0), lit(15))))
      .withColumn("h", pmod((col("i") * 2 + 3) * col("tid") + col("i") * 5 + 7, lit(P)))
      .groupBy(col("doc_id"), col("i")).agg(min(col("h")).as("mh"))
  }

  /** 4 bands of 4 minhashes → (doc_id, band, sig). */
  private def bandSigs(s: SparkSession, dir: String): DataFrame =
    minhashes(s, dir)
      .withColumn("band", (col("i") / 4).cast("int"))
      .withColumn("j", col("i") % 4)
      .groupBy(col("doc_id"), col("band"))
      .agg(concat_ws(",",
        min(when(col("j") === 0, col("mh"))),
        min(when(col("j") === 1, col("mh"))),
        min(when(col("j") === 2, col("mh"))),
        min(when(col("j") === 3, col("mh")))).as("sig"))

  /** candidate pairs: docs sharing ≥1 LSH band, with matching-band count. */
  private[llm] def candidates(s: SparkSession, dir: String): DataFrame = {
    val sigs = bandSigs(s, dir)
    val a = sigs.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig")).where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("band")).as("n_bands"))
  }

  /** SQL mirror of the shingle→minhash→band chain (shared CTE prefix). */
  private[llm] val sqlBands =
    """pos AS (SELECT doc_id,
      |  unnest(string_split(lower(text), ' ')) AS word,
      |  generate_subscripts(string_split(lower(text), ' '), 1) AS pos FROM documents),
      |sh AS (SELECT DISTINCT doc_id, bg FROM (
      |  SELECT doc_id, word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
      |  FROM pos) WHERE bg IS NOT NULL),
      |dict AS (SELECT bg, row_number() OVER (ORDER BY bg) AS tid
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

  val queries: Map[String, Q] = Map(
    "dedup_minhash" -> { (s, dir) =>
      candidates(s, dir).orderBy(col("doc_a"), col("doc_b"))
    },

    // 16-bit SimHash over tf-weighted bigram shingles; candidates share ≥1
    // of 4 bit-chunks (pigeonhole for hamming ≤ 3), verified with exact
    // bit_count(xor).
    "dedup_simhash" -> { (s, dir) =>
      val pos = Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(lower(col("text")), " ")).as(Seq("pos", "word")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val tf = pos.withColumn("next", lead(col("word"), 1).over(w))
        .where(col("next").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("word"), col("next")).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
      val withTid = tf.join(broadcast(dict(tf.select(col("doc_id"), col("bg")))), "bg")
        .withColumn("thash", pmod(col("tid") * 737 + 97, lit(P)))
      val bits = withTid
        .withColumn("j", explode(sequence(lit(0), lit(15))))
        .withColumn("bit", expr("shiftright(thash, j) & 1"))
        .groupBy(col("doc_id"), col("j"))
        .agg(sum(col("tf") * (col("bit") * 2 - 1)).as("vj"))
        .withColumn("sbit", when(col("vj") > 0, 1L).otherwise(0L))
      val sims = bits.groupBy(col("doc_id"))
        .agg(sum(expr("shiftleft(sbit, j)")).as("simhash"))
      val chunks = bits
        .withColumn("c", (col("j") / 4).cast("int"))
        .groupBy(col("doc_id"), col("c"))
        .agg(sum(expr("shiftleft(sbit, j % 4)")).as("cval"))
      val ca = chunks.select(col("doc_id").as("doc_a"), col("c"), col("cval"))
      val cb = chunks.select(col("doc_id").as("doc_b"), col("c"), col("cval"))
      val cand = ca.join(cb, Seq("c", "cval")).where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      cand
        .join(sims.select(col("doc_id").as("doc_a"), col("simhash").as("sim_a")), "doc_a")
        .join(sims.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b")), "doc_b")
        .withColumn("hamming", expr("cast(bit_count(sim_a ^ sim_b) as int)"))
        .where(col("hamming") <= 3)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // exact bigram Jaccard, verified ONLY over MinHash-LSH candidates
    "dedup_ngram_jaccard" -> { (s, dir) =>
      val bigrams = shingles(s, dir)
      val sizes = bigrams.groupBy(col("doc_id")).agg(count(lit(1)).as("nbg"))
      val cand = candidates(s, dir).select(col("doc_a"), col("doc_b"))
      val common = cand
        .join(bigrams.select(col("doc_id").as("doc_a"), col("bg")), "doc_a")
        .join(bigrams.select(col("doc_id").as("doc_b"), col("bg").as("bg2")), "doc_b")
        .where(col("bg") === col("bg2"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
      cand.join(common, Seq("doc_a", "doc_b"), "left")
        .join(sizes.select(col("doc_id").as("doc_a"), col("nbg").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("nbg").as("nb")), "doc_b")
        .withColumn("jaccard",
          round(coalesce(col("common"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("common"), lit(0L))), 6))
        .where(col("jaccard") >= 0.3)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )

  val oracle: Map[String, String] = Map(
    "dedup_minhash" ->
      s"""WITH $sqlBands
         |SELECT doc_a, doc_b, n_bands FROM cand ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_simhash" ->
      """WITH pos AS (SELECT doc_id,
        |  unnest(string_split(lower(text), ' ')) AS word,
        |  generate_subscripts(string_split(lower(text), ' '), 1) AS pos FROM documents),
        |tf AS (SELECT doc_id, bg, count(*) AS tf FROM (
        |  SELECT doc_id, word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
        |  FROM pos) WHERE bg IS NOT NULL GROUP BY 1, 2),
        |dict AS (SELECT bg, row_number() OVER (ORDER BY bg) AS tid
        |         FROM (SELECT DISTINCT bg FROM tf)),
        |bits AS (SELECT doc_id, j,
        |    CASE WHEN sum(tf * (((((tid * 737 + 97) % 2147483647) >> j) & 1) * 2 - 1)) > 0
        |         THEN 1::bigint ELSE 0::bigint END AS sbit
        |  FROM tf JOIN dict USING (bg) CROSS JOIN range(16) r(j)
        |  GROUP BY doc_id, j),
        |sims AS (SELECT doc_id, cast(sum(sbit << j) as bigint) AS simhash FROM bits GROUP BY doc_id),
        |chunks AS (SELECT doc_id, cast(j // 4 as int) AS c, cast(sum(sbit << (j % 4)) as bigint) AS cval
        |           FROM bits GROUP BY doc_id, 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM chunks a JOIN chunks b ON a.c = b.c AND a.cval = b.cval
        |          AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, cast(bit_count(xor(sa.simhash, sb.simhash)) as int) AS hamming
        |FROM cand JOIN sims sa ON cand.doc_a = sa.doc_id
        |JOIN sims sb ON cand.doc_b = sb.doc_id
        |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $sqlBands,
         |sizes AS (SELECT doc_id, count(*) AS nbg FROM sh GROUP BY doc_id),
         |common AS (SELECT c.doc_a, c.doc_b, count(*) AS common
         |  FROM cand c JOIN sh ba ON ba.doc_id = c.doc_a
         |  JOIN sh bb ON bb.doc_id = c.doc_b AND ba.bg = bb.bg
         |  GROUP BY 1, 2)
         |SELECT c.doc_a, c.doc_b,
         |  round(cast(coalesce(m.common, 0) as double)
         |    / (sa.nbg + sb.nbg - coalesce(m.common, 0)), 6) AS jaccard
         |FROM cand c LEFT JOIN common m ON c.doc_a = m.doc_a AND c.doc_b = m.doc_b
         |JOIN sizes sa ON sa.doc_id = c.doc_a
         |JOIN sizes sb ON sb.doc_id = c.doc_b
         |WHERE round(cast(coalesce(m.common, 0) as double)
         |    / (sa.nbg + sb.nbg - coalesce(m.common, 0)), 6) >= 0.3
         |ORDER BY c.doc_a, c.doc_b""".stripMargin
  )
}
