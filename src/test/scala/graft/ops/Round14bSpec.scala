package graft.ops

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Round 14 semantic pins for the Extras44 batch (+ dedup_band_bucket_stats). */
class Round14bSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("stats_auc_roc equals the brute-force pairwise probability") {
    // AUC = P(score_pos > score_neg) + ½P(tie) — the rank-sum identity
    // the operator computes must match the direct pair count
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_extendedprice").as("v"),
        (col("l_returnflag") === "R").as("pos"))
    val pos = li.where(col("pos")).select(col("v").as("vp"))
    val neg = li.where(!col("pos")).select(col("v").as("vn"))
    val r = pos.crossJoin(neg).agg(
      count(lit(1)).as("n"),
      sum(when(col("vp") > col("vn"), 1.0)
        .when(col("vp") === col("vn"), 0.5).otherwise(0.0)).as("wins"))
      .collect()(0)
    val brute = r.getDouble(1) / r.getLong(0)
    val got = q("stats_auc_roc").collect()(0)
    assert(math.abs(got.getAs[Double]("auc") - brute) < 1e-5,
      s"rank-sum AUC ${got.getAs[Double]("auc")} vs brute-force $brute")
    assert(math.abs(got.getAs[Double]("gini") -
      (2 * got.getAs[Double]("auc") - 1)) < 1e-5)
  }

  test("analytics_cross_sell_lift: canonical order, positive lift, ranked support") {
    val rows = q("analytics_cross_sell_lift").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[String]("ta") < r.getAs[String]("tb"))
      assert(r.getAs[Double]("lift") > 0)
    }
    val sup = rows.map(_.getAs[Long]("n_ab"))
    assert(sup.zip(sup.tail).forall { case (a, b) => a >= b })
  }

  test("sample_importance_weighted reproduces the direct acceptance test") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
    val maxChars = docs.map(_.getAs[Long]("n_chars")).max
    val direct = docs.groupBy(_.getAs[String]("lang")).map { case (l, ds) =>
      val sel = ds.filter { d =>
        val id = d.getAs[Long]("doc_id")
        val h = ((id % 2147483647L) * 2654435761L) % 2147483647L
        h % 1000000L < (d.getAs[Long]("n_chars") * 1000000L) / maxChars
      }
      l -> (sel.length.toLong, sel.map(_.getAs[Long]("doc_id")).sum)
    }
    q("sample_importance_weighted").collect().foreach { r =>
      val (n, ck) = direct(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_selected") == n)
      assert(r.getAs[Long]("id_checksum") == ck,
        s"selected SET drifted for ${r.getAs[String]("lang")}")
    }
  }

  test("stats_cohens_d_by_group: sign matches the mean ordering") {
    val means = spark.read.parquet(s"$sf/customer.parquet")
      .groupBy("c_mktsegment").agg(avg("c_acctbal").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = q("stats_cohens_d_by_group").collect()
    assert(rows.length == means.size * (means.size - 1) / 2)
    rows.foreach { r =>
      val d = r.getAs[Double]("cohens_d")
      val diff = means(r.getAs[String]("seg_a")) - means(r.getAs[String]("seg_b"))
      assert(d == 0.0 || d * diff > 0,
        s"effect-size sign must follow the mean difference: $r diff=$diff")
    }
  }

  test("timeseries_week_over_week_growth: one null growth per nation, exact ratio") {
    val rows = q("timeseries_week_over_week_growth").collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_.getAs[Int]("c_nationkey"))
    byNation.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("wk"))
      assert(ordered.head.isNullAt(ordered.head.fieldIndex("wow_growth")),
        "first week has no predecessor")
      ordered.sliding(2).foreach {
        case Array(p, c) if !c.isNullAt(c.fieldIndex("wow_growth")) =>
          val expect = (c.getAs[Long]("rev") - p.getAs[Long]("rev")).toDouble /
            p.getAs[Long]("rev")
          assert(math.abs(c.getAs[Double]("wow_growth") - expect) < 1e-5)
        case _ =>
      }
    }
  }

  test("stats_levene_test: W is finite and non-negative") {
    val r = q("stats_levene_test").collect()(0)
    assert(r.getAs[Long]("k") >= 2)
    val w = r.getAs[Double]("w_stat")
    assert(!w.isNaN && !w.isInfinite && w >= 0, s"W = $w")
  }

  test("encode_ordinal_by_target: ordinals form a permutation monotone in the mean") {
    val rows = q("encode_ordinal_by_target").collect()
    val ords = rows.map(_.getAs[Int]("ordinal")).sorted
    assert(ords.sameElements(1 to rows.length))
    val byOrd = rows.sortBy(_.getAs[Int]("ordinal"))
      .map(_.getAs[Double]("target_mean"))
    assert(byOrd.zip(byOrd.tail).forall { case (a, b) => a <= b })
  }

  test("dedup_band_bucket_stats: per-band doc mass equal, pair mass consistent") {
    val rows = q("dedup_band_bucket_stats").collect()
    assert(rows.length == 4, "one row per LSH band")
    val nDocs = rows.map(_.getAs[Long]("n_docs")).distinct
    assert(nDocs.length == 1, "every doc contributes one sig per band")
    rows.foreach { r =>
      val mx = r.getAs[Long]("max_bucket")
      assert(mx <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("candidate_pairs") >= mx * (mx - 1) / 2,
        "pair mass must at least cover the largest bucket")
      assert(r.getAs[Long]("n_colliding_buckets") <= r.getAs[Long]("n_buckets"))
    }
  }
}
