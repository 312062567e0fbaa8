package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level exact dedup — the C4/CCNet corpus-cleaning step that removes
  * REPEATED SPANS (boilerplate headers, license blocks, navigation chrome)
  * from otherwise-unique documents: split every document into fixed-size
  * word blocks (the testdata documents are flat word streams, so a
  * `blockWords`-word block stands in for the newline-delimited "line" of a
  * web corpus), keep only each block's FIRST occurrence corpus-wide
  * (ordered by (doc_id, block index)), and reassemble the surviving blocks
  * per document in their original order.
  *
  * Scale shape (100 TB): block construction is PURE MAP-SIDE — the
  * native codegen WordBlocks expression slices each document ONCE, and
  * the corpus is scanned ONCE (an earlier draft aggregated first
  * occurrences separately and self-joined back — two full block builds;
  * the keep/drop verdict is instead a row_number window PARTITIONED BY
  * the block text, whose partitions are the duplicate groups themselves:
  * typically 1-2 rows, bounded by the duplication factor, never a
  * corpus-wide partition). Reassembly is one (doc_id) aggregate using
  * the deterministic sort_array(collect_list(struct…)) ordered-collect
  * idiom. Both shuffles key on bounded-width hashes; the pathological
  * corpus of ONE block text repeated everywhere lands that text's rows
  * on one reducer — the same bound as any groupBy over the duplicated
  * content itself.
  */
object LineDedup {

  /** Map-side block split: (blk, btext) rows from a space-separated text
    * column — the native codegen [[graft.functions.WordBlocks]] slices
    * the word array into consecutive `blockWords`-word groups (last
    * block may be partial) in one flat loop, no shuffle, no interpreted
    * HOF lambdas. Shared by the batch operator and the streaming twin
    * ([[graft.streaming.StreamOps.lineDedupBlocks]]). */
  private[graft] def blockized(docs: DataFrame, textCol: String,
      blockWords: Int): DataFrame = {
    require(blockWords >= 1, s"blockWords must be >= 1, got $blockWords")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val blocks = ColumnBridge.column(graft.functions.WordBlocks(
      ColumnBridge.expression(split(col(textCol), " ")), blockWords))
    docs.select((docs.columns.filter(_ != textCol).map(col).toSeq :+
      posexplode(blocks).as(Seq("blk", "btext"))): _*)
  }

  /** PUBLIC API: corpus-wide first-occurrence block dedup. In: documents
    * as (doc_id, text) with single-space-separated words; out: one row
    * per document — (doc_id, clean_text, n_blocks, n_kept), where
    * clean_text concatenates the surviving blocks in original order
    * (empty string when every block of the document occurred earlier
    * elsewhere — the fully-boilerplate page). */
  def lineDedup(docs: DataFrame, blockWords: Int): DataFrame = {
    val blocks = blockized(docs.select(col("doc_id"), col("text")), "text", blockWords)
    // first occurrence = rank 1 in (doc_id, blk) order WITHIN each block
    // text — the same total order as a min-struct argmin, but in one scan
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("btext")).orderBy(col("doc_id"), col("blk"))
    blocks
      .withColumn("keep", row_number().over(w) === 1)
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("keep"), struct(col("blk"), col("btext"))))),
          x => x("btext")), " ").as("clean_text"),
        count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
  }

  val queries: Map[String, Q] = Map(
    // exact copies (doc_id+1000000 for doc_id % 10 = 0, same trick as
    // dedup_exact_docs) guarantee whole-document block overlap on top of
    // whatever natural 8-word repetition the 31-word vocabulary produces;
    // the copy loses every block to the original (higher doc_id) and
    // reads back as clean_text = '' — the fully-boilerplate page.
    "text_line_dedup" -> { (s, dir) =>
      val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      lineDedup(base.unionByName(copies), 8).orderBy(col("doc_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    // DuckDB's lambda index is 1-based → pos = i − 1; first occurrence via
    // the row_number argmin (min (doc_id, blk) per block text — the same
    // total order as the engine's min-struct); string_agg of an all-NULL
    // group is NULL, coalesced to '' to match array_join over empty.
    "text_line_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 10 = 0),
        |w AS (
        |  SELECT d.doc_id, u.el.i - 1 AS pos, u.el.s AS w
        |  FROM d, unnest(list_transform(string_split(d.text, ' '),
        |    (s0, i) -> struct_pack(s := s0, i := i))) AS u(el)),
        |b AS (
        |  SELECT doc_id, pos // 8 AS blk,
        |    string_agg(w, ' ' ORDER BY pos) AS btext
        |  FROM w GROUP BY doc_id, pos // 8),
        |fo AS (
        |  SELECT btext, doc_id AS fdoc, blk AS fblk FROM (
        |    SELECT btext, doc_id, blk,
        |      row_number() OVER (PARTITION BY btext ORDER BY doc_id, blk) AS rn
        |    FROM b) WHERE rn = 1)
        |SELECT b.doc_id,
        |  coalesce(string_agg(
        |    CASE WHEN b.doc_id = f.fdoc AND b.blk = f.fblk THEN b.btext END,
        |    ' ' ORDER BY b.blk), '') AS clean_text,
        |  count(*) AS n_blocks,
        |  cast(sum(CASE WHEN b.doc_id = f.fdoc AND b.blk = f.fblk
        |    THEN 1 ELSE 0 END) as bigint) AS n_kept
        |FROM b JOIN fo f USING (btext)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin
  )
}
