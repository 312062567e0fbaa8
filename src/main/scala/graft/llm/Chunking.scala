package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-shaping operators — the step between a curated corpus and a
  * training run: split long documents into model-window-sized chunks, and
  * pack the token stream into fixed-budget sequences.
  *
  * `text_chunk_split` — sliding-window chunking: token windows of
  * `chunkTokens` every `stride` tokens (stride < chunk ⇒ overlap, the
  * standard trick so no boundary context is lost). Entirely map-side: the
  * token array is built once per doc, chunk starts are a generated
  * `sequence`, and each chunk is a `slice` — one posexplode, no shuffle
  * until the output sort. At 100 TB chunking is embarrassingly parallel.
  *
  * `pipeline_pack_sequences` — concat-and-cut packing: per source, the
  * document token stream is concatenated in doc_id order and cut every
  * `budget` tokens (documents may straddle a cut — exactly how most
  * training pipelines pack, with the trainer handling the straddle).
  * pack_id = floor(exclusive-running-token-count / budget): one window
  * shuffle on the stream key, then a hash agg. Deterministic — no greedy
  * bin packing whose result would depend on partitioning.
  */
object Chunking {

  /** PUBLIC API: sliding-window chunks of `textCol` — output one row per
    * (doc, chunk): (idCol, chunk_idx, n_tokens, chunk md5). */
  def chunkSplit(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      "need 1 <= stride <= chunkTokens (stride > chunk would skip tokens)")
    // null text ⇒ no chunks (without the guard, sequence(0, greatest(
    // size(null)-1, 0)) fabricates one spurious all-null chunk row)
    df.where(col(textCol).isNotNull)
      .withColumn("__toks", split(lower(col(textCol)), " "))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_idx", "start")))
      .select(col(idCol), col("chunk_idx"),
        slice(col("__toks"), col("start") + 1, lit(chunkTokens)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("__chunk")).cast("binary")).as("h"))
  }

  /** PUBLIC API: concat-and-cut packing — assign each doc of the
    * `streamCol`-keyed token stream (ordered by `idCol`) to
    * pack_id = floor(tokens-before-this-doc / budget); adds
    * (n_tokens, pack_id). */
  def packSequences(df: DataFrame, streamCol: String, idCol: String,
      textCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", size(split(lower(col(textCol)), " ")).cast("long"))
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__cum") / budget))
      .drop("__cum")
  }

  val queries: Map[String, Q] = Map(
    // 64-token chunks every 48 tokens (16-token overlap)
    "text_chunk_split" -> { (s, dir) =>
      chunkSplit(Tables(s, dir, "documents"), "doc_id", "text", 64, 48)
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // 4096-token packs per source stream; per-pack stats
    "pipeline_pack_sequences" -> { (s, dir) =>
      packSequences(Tables(s, dir, "documents"), "source", "doc_id", "text", 4096)
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("pack_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "text_chunk_split" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |           FROM documents),
        |starts AS (SELECT doc_id, toks,
        |    unnest(generate_series(0, len(toks) - 1, 48)) AS start
        |  FROM t),
        |c AS (SELECT doc_id,
        |    cast(start // 48 as int) AS chunk_idx,
        |    list_slice(toks, start + 1, start + 64) AS chunk
        |  FROM starts)
        |SELECT doc_id, chunk_idx, cast(len(chunk) as bigint) AS n_tokens,
        |  md5(array_to_string(chunk, ' ')) AS h
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "pipeline_pack_sequences" ->
      """WITH d AS (SELECT source, doc_id,
        |    cast(len(string_split(lower(text), ' ')) as bigint) AS tok
        |  FROM documents),
        |p AS (SELECT source, doc_id, tok,
        |    cast(coalesce(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096
        |      as bigint) AS pack_id
        |  FROM d)
        |SELECT source, pack_id, count(*) AS n_docs,
        |  cast(sum(tok) as bigint) AS sum_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin
  )
}
