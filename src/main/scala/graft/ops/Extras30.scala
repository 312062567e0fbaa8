package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-10 batch 2: Nelson-Aalen cumulative hazard (the Kaplan-Meier
  * companion), a count-min-sketch mergeability contract, a join-key skew
  * report (the AQE-skew diagnostic), and an embedding-norm hygiene audit.
  */
object Extras30 {

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** count-min sketch geometry: 4 independent rows × 512 counters;
    * hash_i(k) = ((a_i·k + b_i) mod p) mod 512 with prime p = 2³¹−1 and
    * literal odd multipliers — pure integer math, identical both engines. */
  private val cmsA = Seq(1299721L, 15485863L, 32452843L, 49979687L)
  private val cmsB = Seq(104729L, 224737L, 350377L, 479909L)
  private val cmsP = 2147483647L
  private val cmsW = 512L

  val queries: Map[String, Q] = Map(
    // Nelson-Aalen cumulative hazard over the same censored customer
    // lifetimes as survival_kaplan_meier: H(t) = Σ_{t'≤t} d/n — the
    // additive (and at small d/n, numerically safer) sibling of the KM
    // product. Terms are exact integer ratios quantized DECIMAL(18,12)
    // before the distributed prefix sum, so the cumsum is associative;
    // ONE division per grain row, no ln/exp at all (tighter parity class
    // than KM: d/n is a single correctly-rounded IEEE divide).
    "survival_nelson_aalen" -> { (s, dir) =>
      val ar = Extras29.atRiskTable(s, dir)
      val terms = ar.select(lit(0L).as("__p"), col("t"),
        (col("d").cast(DoubleType) / col("n_at_risk").cast(DoubleType))
          .cast(DecimalType(18, 12)).as("term"))
      val cum = GraftOps.distributedRunningSum(terms, "__p", "t", "term", "haz")
      ar.join(cum.select("t", "haz"), "t")
        .select(col("t"), col("n_at_risk"), col("d").as("n_events"),
          round(col("haz").cast(DoubleType), 6).as("cum_hazard"))
        .orderBy("t")
    },

    // count-min sketch contract over part demand: 4×512 integer counter
    // rows built as FOUR bucket-grain hash aggregates (map-side partials
    // → each shuffles 512 rows regardless of input size; sketches merge
    // by pure addition across splits, the CMS property). Estimates for
    // the top-10 true keys = min over the 4 rows' counters; the emitted
    // contract is the CMS guarantee est ≥ true (overcount-only) plus the
    // overcount itself. Integer-only end to end.
    "profile_cms_heavy_hitters" -> { (s, dir) =>
      val keys = Tables(s, dir, "lineitem")
        .select(col("l_partkey").cast("long").as("k"))
      def bucket(i: Int, k: Column): Column =
        ((lit(cmsA(i)) * k + lit(cmsB(i))) % cmsP) % cmsW
      val sketch = (0 until 4).map { i =>
        keys.select(lit(i.toLong).as("row_id"), bucket(i, col("k")).as("bucket"))
          .groupBy("row_id", "bucket").agg(count(lit(1)).as("cnt"))
      }.reduce(_ unionAll _)
      val top10 = keys.groupBy("k").agg(count(lit(1)).as("true_cnt"))
        .orderBy(col("true_cnt").desc, col("k")).limit(10)
      val probes = top10.select(col("k"), col("true_cnt"),
        explode(array((0 until 4).map { i =>
          struct(lit(i.toLong).as("row_id"), bucket(i, col("k")).as("bucket"))
        }: _*)).as("p"))
        .select(col("k"), col("true_cnt"),
          col("p.row_id").as("row_id"), col("p.bucket").as("bucket"))
      probes.join(sketch, Seq("row_id", "bucket"))
        .groupBy(col("k"), col("true_cnt"))
        .agg(min(col("cnt")).as("est_cnt"))
        .select(col("k").as("l_partkey"), col("true_cnt"), col("est_cnt"),
          (col("est_cnt") - col("true_cnt")).as("overcount"),
          (col("est_cnt") >= col("true_cnt")).as("sketch_ok"))
        .orderBy(col("true_cnt").desc, col("l_partkey"))
    },

    // join-key skew report — the "will AQE need skew-join here?"
    // diagnostic a 100 TB operator runs before shipping a join: for each
    // audited fact join key, per-key counts reduce map-side, then one
    // tiny aggregate emits rows, distinct keys, the hottest key's share,
    // and the p99/p50 count ratio (discrete percentiles — actual data
    // values, no interpolation). Three audited keys → three rows.
    "profile_join_key_skew" -> { (s, dir) =>
      def audit(keyName: String, df: DataFrame, key: String): DataFrame = {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + seq.incrementAndGet()
        val v = s"graft_skew_$tag"
        df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
          .createOrReplaceTempView(v)
        try s.sql(
          s"""SELECT '$keyName' AS key_col,
             |  cast(count(*) AS bigint) AS n_keys,
             |  cast(sum(cnt) AS bigint) AS n_rows,
             |  cast(max(cnt) AS bigint) AS max_cnt,
             |  cast(percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)
             |    AS bigint) AS p50_cnt,
             |  cast(percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt)
             |    AS bigint) AS p99_cnt,
             |  round(cast(max(cnt) AS double) / cast(sum(cnt) AS double), 6)
             |    AS top_share
             |FROM $v""".stripMargin)
        finally s.catalog.dropTempView(v)
      }
      audit("lineitem.l_partkey", Tables(s, dir, "lineitem"), "l_partkey")
        .unionAll(audit("lineitem.l_suppkey", Tables(s, dir, "lineitem"),
          "l_suppkey"))
        .unionAll(audit("orders.o_custkey", Tables(s, dir, "orders"),
          "o_custkey"))
        .orderBy("key_col")
    },

    // embedding-norm hygiene audit — the gate a vector pipeline runs
    // before indexing: per label, vector count, how many are already
    // unit-norm (|‖v‖−1| < 1e-3), min/max norm (raw doubles — identical
    // in both engines, no rounding needed), and the mean norm in exact
    // integer micro-units (floor-quantized per vector, integer sum, one
    // floor division — no cross-engine rounding surface at all). Norms
    // come from the same ascending-index double dot both engines share
    // (native DotProduct ≡ DuckDB list_dot_product); sqrt is correctly
    // rounded per IEEE-754. Fully map-side until the label-grain agg.
    "sim_embedding_norm_audit" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val vd = expr("transform(embedding, x -> cast(x as double))")
      val dot = ColumnBridge.column(graft.functions.DotProduct(
        ColumnBridge.expression(vd), ColumnBridge.expression(vd)))
      Tables(s, dir, "embeddings")
        .select(col("label"), sqrt(dot).as("norm"))
        .select(col("label"), col("norm"),
          floor(col("norm") * 1e6).cast("long").as("nq"),
          when(abs(col("norm") - 1.0) < 0.001, 1L).otherwise(0L).as("unit"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"), sum(col("unit")).as("n_unit"),
          min(col("norm")).as("min_norm"), max(col("norm")).as("max_norm"),
          expr("CAST(sum(nq) DIV count(1) AS bigint)").as("mean_norm_micro"))
        .orderBy("label")
    }
  )

  val oracle: Map[String, String] = Map(
    "survival_nelson_aalen" ->
      s"""WITH ${Extras29.sqlAtRisk},
        |haz AS (SELECT t, n_at_risk, d,
        |    sum(cast(cast(d AS double) / cast(n_at_risk AS double)
        |          AS decimal(18,12))) OVER (ORDER BY t) AS h
        |  FROM ar)
        |SELECT t, cast(n_at_risk AS bigint) AS n_at_risk, d AS n_events,
        |  round(cast(h AS double), 6) AS cum_hazard
        |FROM haz ORDER BY t""".stripMargin,
    "profile_cms_heavy_hitters" -> {
      val sketches = (0 until 4).map { i =>
        s"""SELECT ${i}::bigint AS row_id,
           |  ((${cmsA(i)} * k + ${cmsB(i)}) % $cmsP) % $cmsW AS bucket,
           |  cast(count(*) AS bigint) AS cnt
           |FROM keys GROUP BY 1, 2""".stripMargin
      }.mkString("\nUNION ALL\n")
      val probes = (0 until 4).map { i =>
        s"""SELECT k, true_cnt, ${i}::bigint AS row_id,
           |  ((${cmsA(i)} * k + ${cmsB(i)}) % $cmsP) % $cmsW AS bucket
           |FROM top10""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH keys AS (SELECT cast(l_partkey AS bigint) AS k FROM lineitem),
         |sketch AS ($sketches),
         |top10 AS (SELECT k, cast(count(*) AS bigint) AS true_cnt
         |  FROM keys GROUP BY k ORDER BY true_cnt DESC, k LIMIT 10),
         |probes AS ($probes)
         |SELECT p.k AS l_partkey, p.true_cnt,
         |  min(s.cnt) AS est_cnt,
         |  min(s.cnt) - p.true_cnt AS overcount,
         |  min(s.cnt) >= p.true_cnt AS sketch_ok
         |FROM probes p JOIN sketch s USING (row_id, bucket)
         |GROUP BY p.k, p.true_cnt
         |ORDER BY p.true_cnt DESC, p.k""".stripMargin
    },
    "profile_join_key_skew" -> {
      def audit(keyName: String, tbl: String, key: String): String =
        s"""SELECT '$keyName' AS key_col,
           |  cast(count(*) AS bigint) AS n_keys,
           |  cast(sum(cnt) AS bigint) AS n_rows,
           |  cast(max(cnt) AS bigint) AS max_cnt,
           |  quantile_disc(cnt, 0.5) AS p50_cnt,
           |  quantile_disc(cnt, 0.99) AS p99_cnt,
           |  round(cast(max(cnt) AS double) / cast(sum(cnt) AS double), 6)
           |    AS top_share
           |FROM (SELECT cast(count(*) AS bigint) AS cnt
           |      FROM $tbl GROUP BY $key)""".stripMargin
      s"""SELECT * FROM (
         |${audit("lineitem.l_partkey", "lineitem", "l_partkey")}
         |UNION ALL
         |${audit("lineitem.l_suppkey", "lineitem", "l_suppkey")}
         |UNION ALL
         |${audit("orders.o_custkey", "orders", "o_custkey")})
         |ORDER BY key_col""".stripMargin
    },
    "sim_embedding_norm_audit" ->
      """WITH n AS (SELECT label,
        |    sqrt(list_dot_product(
        |      list_transform(embedding, x -> cast(x as double)),
        |      list_transform(embedding, x -> cast(x as double)))) AS norm
        |  FROM embeddings)
        |SELECT label, cast(count(*) AS bigint) AS n_vecs,
        |  cast(sum(CASE WHEN abs(norm - 1.0) < 0.001 THEN 1 ELSE 0 END)
        |    AS bigint) AS n_unit,
        |  min(norm) AS min_norm, max(norm) AS max_norm,
        |  cast(sum(cast(floor(norm * 1e6) AS bigint)) // count(*) AS bigint)
        |    AS mean_norm_micro
        |FROM n GROUP BY label ORDER BY label""".stripMargin
  )
}
