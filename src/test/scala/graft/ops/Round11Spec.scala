package graft.ops

import graft.{SparkSuite, TestSpark}
import org.apache.spark.sql.functions._

/** Round-11 pins: exact-substring dedup semantics, the basket-size cap
  * that closed the skew-probe OOM, and the round-10 ADVICE hardening
  * (PPM raster overflow, vocab sort-key range, extension arg checks). */
class Round11Spec extends SparkSuite {
  private val spark0 = TestSpark.spark
  import spark0.implicits._

  test("substrDedup cuts EVERY occurrence of a repeated span, offset-independent") {
    val shared = (1 to 7).map(i => s"s$i")
    val run = (1 to 6).map(i => s"r$i")
    val docs = Seq(
      // shared 7-word span at offset 5 …
      1L -> ((1 to 5).map(i => s"a$i") ++ shared ++ (1 to 4).map(i => s"b$i")),
      // … and the same span at offset 2 (fixed-block dedup cannot align these)
      2L -> ((1 to 2).map(i => s"c$i") ++ shared ++ (1 to 3).map(i => s"d$i")),
      // all-unique doc: untouched
      3L -> (1 to 6).map(i => s"e$i"),
      // a 6-word run repeated WITHIN one doc: both occurrences cut
      4L -> (run ++ Seq("x1") ++ run ++ Seq("x2")))
      .map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    val out = graft.llm.SubstrDedup.substrDedup(docs, 5)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_spans", "n_removed", "clean_text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out(0) == ((1L, 16L, 1L, 7L,
      ((1 to 5).map(i => s"a$i") ++ (1 to 4).map(i => s"b$i")).mkString(" "))))
    assert(out(1) == ((2L, 12L, 1L, 7L, "c1 c2 d1 d2 d3")))
    assert(out(2) == ((3L, 6L, 0L, 0L, (1 to 6).map(i => s"e$i").mkString(" "))))
    assert(out(3) == ((4L, 14L, 2L, 12L, "x1 x2")))
  }

  test("a hot orderkey's mega-basket is dropped before pair expansion") {
    // 200 distinct parts on one orderkey — the shape that OOM'd the
    // pre-cap edge build under the skew probe's hot-key corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_basket").toString
    val li = (1 to 200).map(p => (1L, p.toLong)) ++
      Seq((2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val baskets = Graph.basketsCached(spark0, dir)
      .select(col("l_orderkey"), size(col("items")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(baskets.toSeq == Seq((2L, 2), (3L, 2)),
      s"mega-basket not dropped: ${baskets.mkString(",")}")
    assert(Graph.MaxBasket == 64)
  }

  test("PPM decoder rejects dimension-overflow headers loudly") {
    // w*h*3 = 2^32 + 2 overflows Int to 2 — pre-fix this passed the
    // truncation check and emitted garbage features
    val payload = "P6 1431655766 1 255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](16)(7)
    val e = intercept[IllegalArgumentException] {
      graft.llm.Multimodal.decodePpm(payload)
    }
    assert(e.getMessage.contains("truncated raster"))
  }

  test("vocab coverage sort key orders correctly past 1e9 occurrences") {
    // the pre-fix 10-digit pad truncated (1e9 - freq) for freq >= 1e9;
    // the Long.MaxValue pad must keep (freq DESC, word ASC) total order
    val df = Seq(("a", 1L), ("b", 3000000000L), ("c", 999999999L),
      ("d", 3000000000L), ("e", 1000000000L)).toDF("w", "freq")
    val got = df.select(col("w"),
      concat(lpad((lit(Long.MaxValue) - col("freq")).cast("string"), 19, "0"),
        lit("|"), col("w")).as("ord"))
      .orderBy("ord").select("w").as[String].collect().toSeq
    assert(got == Seq("b", "d", "e", "c", "a"))
  }

  test("graft_bloom_build names the offending argument on a non-literal") {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    val e = intercept[Exception] {
      s2.sql("SELECT graft_bloom_build(k, k, 3) FROM (SELECT 1L AS k) t")
        .collect()
    }
    assert(e.getMessage.contains("numBits must be an integer literal"),
      s"got: ${e.getMessage}")
  }
}
