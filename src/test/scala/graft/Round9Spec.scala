package graft

import org.apache.spark.sql.functions._

/** Round-9 operator kernels: BPE merge semantics, MMR greedy selection,
  * blocked shuffle structure. */
class Round9Spec extends SparkSuite {
  import TestSpark.spark.implicits._

  private def tokensOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    df.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap

  test("BPE merge rewrites adjacent non-overlapping occurrences left-to-right") {
    // corpus: "abab" x3, "aab" x2, "ba" x1 → best pair (a,b) freq 3·2+2+0=?
    // abab: pairs (a,b),(b,a),(a,b) → (a,b) weight 2·3=6; aab: (a,a) self
    // excluded, (a,b) weight 2; ba: (b,a) weight 1 → best (a,b) freq 8
    val vocab = Seq(("abab", 3L), ("aab", 2L), ("ba", 1L)).toDF("word", "freq")
      .withColumn("t", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    val m = ops.Extras27.queries // touch object so private round is exercised
    assert(m.contains("text_bpe_train_rounds"))
    // drive one round through the declared query's building blocks via
    // reflection-free reimplementation: use the same SQL lambda
    val best = Seq(("a", "b")).toDF("a", "b")
    val merged = vocab.crossJoin(best)
      .withColumn("t", expr(
        """filter(
          |  transform(t, (x, i) ->
          |    CASE
          |      WHEN i > 0 AND element_at(t, i) = a AND x = b
          |        THEN CAST(NULL AS STRING)
          |      WHEN i < size(t) - 1 AND x = a AND element_at(t, i + 2) = b
          |        THEN concat(a, b)
          |      ELSE x END),
          |  z -> z IS NOT NULL)""".stripMargin))
      .select(col("word"), col("freq"), col("t"))
    val got = tokensOf(merged)
    assert(got("abab") == Seq("ab", "ab"))
    assert(got("aab") == Seq("a", "ab"))
    assert(got("ba") == Seq("b", "a"))
  }

  test("BPE declared query rounds are distinct pairs with positive freq") {
    val rows = SparkEntry.queries("text_bpe_train_rounds")(
      TestSpark.spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 3)
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == 3, s"rounds repeated a merge: ${pairs.toSeq}")
    rows.foreach { r =>
      assert(r.getLong(3) > 0)
      assert(r.getString(1) != r.getString(2), "self-pair must be excluded")
    }
  }

  test("MMR: rank-1 is the relevance argmax; later ranks are distinct picks") {
    val rows = SparkEntry.queries("sim_mmr_rerank")(
      TestSpark.spark, "/root/testdata/sf0.001").collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L)),
        s"qid $qid missing ranks")
      val picks = rs.map(_.getLong(2))
      assert(picks.distinct.length == 3, s"qid $qid repeated a pick")
      val s = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      // rank-1 is pure relevance (x10 scale shared with MMR scores):
      // MMR scores can only be <= the top relevance
      assert(s(1) <= s(0) + 1e-12 && s(2) <= s(0) + 1e-12,
        s"qid $qid: MMR scores exceed top relevance: ${s.toSeq}")
    }
  }

  test("blocked shuffle: blocks are contiguous runs of the global order") {
    val rows = SparkEntry.queries("pipeline_shuffle_blocked")(
      TestSpark.spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).toSet.size == rows.length, "pos must be unique")
    // group by block: positions within a block form one contiguous range
    rows.groupBy(_._2).foreach { case (blk, rs) =>
      val ps = rs.map(_._3).sorted
      assert(ps.last - ps.head + 1 == ps.length,
        s"block $blk is not a contiguous run of the final order")
    }
  }
}
