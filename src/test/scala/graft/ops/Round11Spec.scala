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

  test("rank sketch bounds rank error on heavy-tailed data in the compression regime") {
    // 200k rows, x = u^10 — the distribution shape that defeats the
    // equi-width histogram sketch (one bucket owns most of the mass);
    // shards of ~6250 rows give k ≈ 12, so the sketch actually compresses
    val n = 200000L
    val df = spark0.range(n).select(
      pow((col("id") % 9973L).cast("double") / 9973.0, 10.0).as("x"),
      col("id").as("event_id"))
    val s = 32
    val samples = Extras36.rankSamples(df, "x", "event_id", s, 512)
    val nSamples = samples.count()
    assert(nSamples < n / 8, s"no compression: $nSamples samples of $n rows")
    val bound = samples.select("shard", "w").distinct()
      .agg(sum(col("w")) + max(col("w"))).head().getLong(0)
    val cum = graft.GraftOps.distributedRunningSum(
      samples.select(lit(0L).as("__p"), col("x"), col("w")),
      "__p", "x", "w", "cumw")
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val target = math.ceil(q * n).toLong
      val est = cum.where(col("cumw") >= target).agg(min(col("x")))
        .head().getDouble(0)
      val estRank = df.where(col("x") <= est).count()
      assert(math.abs(estRank - target) <= bound,
        s"q=$q: rank error ${math.abs(estRank - target)} > bound $bound")
    }
  }

  private def extensionsSession(): org.apache.spark.sql.SparkSession = {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
  }

  test("big kernels are SQL-callable as injected table functions") {
    val s2 = extensionsSession()
    import s2.implicits._

    // distributedNtile: 100 unique (x, id) rows → 4 exact quartiles
    (1 to 100).map(i => (i.toLong, (i * 37 % 101).toDouble))
      .toDF("id", "x").createOrReplaceTempView("g_nt")
    val nt = s2.sql("SELECT * FROM graft_ntile('g_nt', 'x,id', 4, 'q')")
    assert(nt.count() == 100)
    assert(nt.groupBy("q").count().orderBy("q")
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getLong(1)))
      .toSeq == Seq((1L, 25L), (2L, 25L), (3L, 25L), (4L, 25L)))

    // asofJoin: latest right value at-or-before each left time, per key
    Seq((1L, 10L), (1L, 25L), (2L, 5L)).toDF("k", "t")
      .createOrReplaceTempView("g_al")
    Seq((1L, 8L, "a"), (1L, 20L, "b"), (2L, 9L, "c")).toDF("k", "rt", "v")
      .createOrReplaceTempView("g_ar")
    val aj = s2.sql(
      "SELECT * FROM graft_asof_join('g_al', 'g_ar', 'k', 't', 'rt', 'v')")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(aj.toSeq == Seq((1L, 10L, Some("a")), (1L, 25L, Some("b")),
      (2L, 5L, None)))

    // minhash LSH candidates: two near-identical docs bucket together
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    Seq((1L, base), (2L, base + " tailword"), (3L, (1 to 40)
      .map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
      .createOrReplaceTempView("g_md")
    val mc = s2.sql(
      "SELECT * FROM graft_minhash_candidates('g_md', 'doc_id', 'text', 3)")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mc.contains((1L, 2L)), s"near-dup pair missing: ${mc.mkString(",")}")
    assert(!mc.contains((1L, 3L)) && !mc.contains((2L, 3L)))

    // quotaPerGroup: per-group row caps from a quotas relation
    (1 to 10).map(i => (if (i <= 7) "a" else "b", i.toLong))
      .toDF("g", "o").createOrReplaceTempView("g_qd")
    Seq(("a", 2L), ("b", 5L)).toDF("g", "quota")
      .createOrReplaceTempView("g_qq")
    val qp = s2.sql(
      "SELECT * FROM graft_quota_per_group('g_qd', 'g', 'o', 'g_qq')")
      .groupBy("g").count().collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    assert(qp.toSeq == Seq(("a", 2L), ("b", 3L)), qp.mkString(","))
  }

  test("graft_bloom_build names the offending argument on a non-literal") {
    val s2 = extensionsSession()
    val e = intercept[Exception] {
      s2.sql("SELECT graft_bloom_build(k, k, 3) FROM (SELECT 1L AS k) t")
        .collect()
    }
    assert(e.getMessage.contains("numBits must be an integer literal"),
      s"got: ${e.getMessage}")
  }
}
