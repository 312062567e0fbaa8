package graft

import org.apache.spark.sql.functions._

/** Sequence-shaping APIs (llm.Chunking) on user DataFrames. */
class ChunkingSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  test("chunkSplit windows with overlap and a short tail") {
    // 10 tokens, chunk 4, stride 3 → starts 0,3,6,9 → sizes 4,4,4,1
    val df = Seq((1L, "a b c d e f g h i j")).toDF("id", "body")
    val rows = GraftOps.chunkSplit(df, "id", "body", 4, 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(rows.toSeq == Seq((0, 4L), (1, 4L), (2, 4L), (3, 1L)))
  }

  test("chunkSplit overlapping windows share boundary tokens (md5 check)") {
    val df = Seq((1L, "a b c d e f")).toDF("id", "body")
    // chunk 4 stride 2 → chunks: "a b c d", "c d e f", "e f"
    val hs = GraftOps.chunkSplit(df, "id", "body", 4, 2)
      .orderBy("chunk_idx").select("h").collect().map(_.getString(0))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hs.toSeq == Seq(m("a b c d"), m("c d e f"), m("e f")))
  }

  test("chunkSplit emits no chunks for null text (oracle parity)") {
    val df = Seq((1L, Some("a b c")), (2L, None))
      .toDF("id", "body")
    val ids = GraftOps.chunkSplit(df, "id", "body", 2, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L), s"null-text doc must produce no chunk rows, got $ids")
  }

  test("packSequences cuts the stream at the token budget") {
    // per-doc 4 tokens, budget 10: cum-before 0,4,8,12,16 → packs 0,0,0,1,1
    val docs = (1 to 5).map(i => (i.toLong, "s1", "t t t t"))
      .toDF("id", "src", "body")
    val packs = GraftOps.packSequences(docs, "src", "id", "body", 10)
      .orderBy("id").select("pack_id").collect().map(_.getLong(0))
    assert(packs.toSeq == Seq(0L, 0L, 0L, 1L, 1L))
  }

  test("packSequences is per-stream: streams pack independently") {
    // budget 4, 3 tokens/doc: within each stream the second doc sees
    // cum-before 3 → still pack 0. A single merged stream would have put
    // ids 3 and 4 at cum-before 6 and 9 → packs 1 and 2.
    val docs = Seq((1L, "a", "t t t"), (2L, "b", "t t t"),
      (3L, "a", "t t t"), (4L, "b", "t t t")).toDF("id", "src", "body")
    val byId = GraftOps.packSequences(docs, "src", "id", "body", 4)
      .select("id", "pack_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }
}
