package graft

import graft.functions.{BloomFunctions, BloomKernels}
import org.apache.spark.sql.functions._

/** Round-8 additions: Bloom-filter runtime reduction, the k-means Lloyd
  * step, line-level (block) dedup, and the new composite-analytics plan
  * shapes. */
class Round8Spec extends SparkSuite {
  import BloomFunctions._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  // ---- Bloom kernels --------------------------------------------------

  test("bloom filter has NO false negatives over a key set") {
    val words = new Array[Long](1024 / 64)
    val keys = (0L until 500L).map(_ * 7919L)
    keys.foreach(BloomKernels.setBits(words, 7, 1024, _))
    val bytes = BloomKernels.toBytes(words, 7)
    assert(keys.forall(BloomKernels.mightContain(bytes, _)))
  }

  test("bloom filter false-positive rate is sane at ~10 bits/key") {
    val nBits = 1 << 14
    val words = new Array[Long](nBits / 64)
    (0L until 1600L).foreach(k => BloomKernels.setBits(words, 7, nBits, k))
    val bytes = BloomKernels.toBytes(words, 7)
    val fps = (1000000L until 1010000L).count(BloomKernels.mightContain(bytes, _))
    assert(fps < 500, s"$fps false positives in 10000 probes") // ~1% expected
  }

  test("bloomBuild is partition-order-invariant (bit-OR merge)") {
    import spark.implicits._
    val keys = (1L to 1000L).toDF("k")
    val a = keys.repartition(1).agg(bloomBuild(col("k"), 4096)).head.getAs[Array[Byte]](0)
    val b = keys.repartition(7).agg(bloomBuild(col("k"), 4096)).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("bloomMightContain as a DataFrame prefilter never drops a joining row") {
    import spark.implicits._
    val dim = (1L to 50L).map(_ * 3L).toDF("k")
    val fact = (1L to 150L).toDF("fk")
    val bloom = dim.agg(bloomBuild(col("k"), 1024).as("bf"))
    val reduced = fact.crossJoin(broadcast(bloom))
      .where(bloomMightContain(col("bf"), col("fk")))
      .join(dim, col("fk") === col("k"))
      .select("fk").as[Long].collect().toSet
    val plain = fact.join(dim, col("fk") === col("k"))
      .select("fk").as[Long].collect().toSet
    assert(reduced == plain)
  }

  test("join_bloom_reduced probes via a codegen Filter fed by a scalar subquery, never a conditioned BNLJ") {
    val p = plan("join_bloom_reduced")
    assert(p.contains("bloom_might_contain"), p.take(3000))
    // the probe is a Filter over the fact scan (scalar-subquery feed) —
    // NOT a cross-join condition (the interpreted-BNLJ trap the
    // full-suite PlanSpec guard rejects)
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("bloom_might_contain")), p.take(3000))
  }

  test("text_decontaminate_bloom probes map-side via a subquery-fed codegen filter") {
    val p = plan("text_decontaminate_bloom")
    assert(p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("bloom_might_contain")), p.take(3000))
    // the 1-row contract aggregates ride UNconditioned broadcast cross
    // joins (scalar-stat shape); the probe itself must not condition one
    p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).foreach { l =>
      assert(!l.contains("bloom_might_contain"), l)
    }
  }

  test("join_partition_pruned_dynamic gets a dynamicpruning PartitionFilter on the fact scan") {
    val p = plan("join_partition_pruned_dynamic")
    assert(p.toLowerCase.contains("dynamicpruning"), p.take(4000))
  }

  // ---- k-means Lloyd step --------------------------------------------

  test("kmeansUpdate computes per-cluster element-wise means") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0, 0.0)),
      (2L, Array(0.6, 0.8)),
      (3L, Array(0.0, 1.0))).toDF("vec_id", "v")
    val cents = Seq(
      (10L, Array(1.0, 0.0)),
      (20L, Array(0.0, 1.0))).toDF("cid", "cv")
    val got = llm.Similarity.kmeansUpdate(vecs, cents)
      .orderBy("cid", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // v2 (cos 0.6 vs 0.8) joins c20; means: c10 = (1,0) n=1, c20 = (.3,.9) n=2
    assert(got.toSeq == Seq(
      (10L, 0, 1L, 1.0), (10L, 1, 1L, 0.0),
      (20L, 0, 2L, 0.3), (20L, 1, 2L, 0.9)))
  }

  test("kmeansUpdate omits empty clusters (Lloyd contract)") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "v")
    val cents = Seq(
      (10L, Array(1.0, 0.0)),
      (99L, Array(0.0, 1.0))).toDF("cid", "cv")
    val cids = llm.Similarity.kmeansUpdate(vecs, cents)
      .select("cid").distinct().as[Long].collect().toSet
    assert(cids == Set(10L))
  }

  test("kmeansTrain folds means back as unit centroids and converges on separated groups") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0, 0.0)),
      (2L, Array(0.6, 0.8)),
      (3L, Array(0.0, 1.0))).toDF("vec_id", "v")
    val init = Seq(
      (10L, Array(1.0, 0.0)),
      (20L, Array(0.0, 1.0))).toDF("cid", "cv")
    val out = llm.Similarity.kmeansTrain(vecs, init, 2).orderBy("cid").collect()
    val c1 = out(0).getSeq[Double](1)
    val c2 = out(1).getSeq[Double](1)
    // c10 keeps (1,0); c20 = unit mean of {v2, v3} = (0.3, 0.9)/|(0.3, 0.9)|
    assert(c1 == Seq(1.0, 0.0))
    assert(math.abs(c2(0) - 0.31622776601683794) < 1e-9 &&
      math.abs(c2(1) - 0.9486832980505138) < 1e-9, c2)
  }

  test("kmeansTrain keeps the previous centroid when members cancel to a zero mean") {
    import spark.implicits._
    // with a single centroid both vectors must land on it, and their
    // mean is exactly (0,0) — unit() would emit NaN without the
    // keep-previous guard, poisoning every later round
    val vecs = Seq(
      (1L, Array(1.0, 0.0)),
      (2L, Array(-1.0, 0.0))).toDF("vec_id", "v")
    val init = Seq((10L, Array(1.0, 0.0))).toDF("cid", "cv")
    val out = llm.Similarity.kmeansTrain(vecs, init, 2).orderBy("cid").collect()
    val c10 = out(0).getSeq[Double](1)
    assert(!c10.exists(_.isNaN) && c10 == Seq(1.0, 0.0), c10)
  }

  test("kmeansTrain keeps the previous centroid for a cluster that empties") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "v")
    val init = Seq(
      (10L, Array(1.0, 0.0)),
      (99L, Array(0.0, 1.0))).toDF("cid", "cv")
    val out = llm.Similarity.kmeansTrain(vecs, init, 1).orderBy("cid").collect()
    assert(out.length == 2 && out(1).getSeq[Double](1) == Seq(0.0, 1.0))
  }

  test("sim_kmeans_update plan assigns via broadcast centroids, no shuffle of v on cid") {
    val p = plan("sim_kmeans_update")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  // ---- line-level dedup ----------------------------------------------

  test("lineDedup keeps first occurrence corpus-wide and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z w"),
      (2L, "x y q r"),
      (3L, "x y z w") // exact copy of doc 1 — loses every block
    ).toDF("doc_id", "text")
    val got = llm.LineDedup.lineDedup(docs, 2).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "x y z w", 2L, 2L),
      (2L, "q r", 2L, 1L),
      (3L, "", 2L, 0L)))
  }

  test("WordBlocks is byte-identical to the transform/slice/array_join HOF chain") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val words = split(col("text"), " ")
    val native = ColumnBridge.column(
      graft.functions.WordBlocks(ColumnBridge.expression(words), 8))
    val nBlocks = ((size(words) + lit(7)) / lit(8)).cast("int")
    val hof = transform(sequence(lit(0), nBlocks - 1),
      i => array_join(slice(words, i * 8 + 1, lit(8)), " "))
    val diff = Tables(spark, sf, "documents")
      .select(native.as("a"), hof.as("b"))
      .where(not(col("a") === col("b"))).count()
    assert(diff == 0L)
  }

  test("lineDedup: trailing partial block is its own line") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = llm.LineDedup.lineDedup(docs, 2).collect()(0)
    assert(got.getString(1) == "a b c" && got.getLong(2) == 2L)
  }

  test("decontaminateBloom flags a superset of the exact overlap on user data") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f g h extra words here now"),
      (2L, "totally different words with no overlap at all ok"),
      (3L, "x y z a b c d e f g h tail")).toDF("doc_id", "text")
    val evalSet = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val bloom = llm.Curation.decontaminateBloom(corpus, evalSet, "doc_id", "text", 8, 4096)
      .select("doc_id").as[Long].collect().toSet
    val exact = llm.Curation.decontaminate(corpus, evalSet, "doc_id", "text", 8)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 3L))
    assert(exact.subsetOf(bloom), s"bloom=$bloom exact=$exact")
  }

  test("scd2History closes each version at the key's next change") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 02:00:00")
    val changes = Seq((1L, t0, "a"), (1L, t1, "b"), (1L, t2, "c"), (2L, t0, "z"))
      .toDF("k", "ts", "attr")
    val got = ops.Extras6.scd2History(changes, "k", "ts", Nil)
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getString(2),
        Option(r.getTimestamp(4)).map(_.toString), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, "a", Some("2024-01-01 01:00:00.0"), false),
      (1L, "b", Some("2024-01-01 02:00:00.0"), false),
      (1L, "c", None, true),
      (2L, "z", None, true)))
  }

  // ---- composite analytics plan shapes -------------------------------

  test("analytics_waiting_suppliers realizes EXISTS/NOT EXISTS as semi + anti joins") {
    val p = plan("analytics_waiting_suppliers")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("LeftAnti"), p.take(3000))
  }

  test("analytics_volume_shipping broadcasts both treaty-nation dims") {
    val p = plan("analytics_volume_shipping")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("analytics_supplier_part_types keeps the bad-supplier exclusion a broadcast anti join") {
    val p = plan("analytics_supplier_part_types")
    assert(p.contains("LeftAnti"), p.take(3000))
  }
}
