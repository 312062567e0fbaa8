package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 12 batch 3: t-closeness (completing the k-anonymity /
  * l-diversity privacy-audit trio) and event-type affinity — both
  * one-fact-shuffle reports with dimension-sized downstream frames.
  */
object Extras40 {

  val queries: Map[String, Q] = Map(

    // t-closeness audit: for each quasi-identifier block, the distance
    // between its sensitive-attribute (market segment) distribution and
    // the global one. For a NOMINAL sensitive attribute the earth-mover
    // distance reduces to total variation: t_b = ½·Σ_s |p_{b,s} − p_s| =
    // Σ_s |n_bs·N − n_s·n_b| / (2·n_b·N) — the numerator stays an exact
    // DECIMAL(38,0) integer (missing (block, segment) cells count as
    // n_bs = 0 via the dimension-sized block×segment grid), so the only
    // IEEE arithmetic is the final division and threshold compares are
    // engine-deterministic. Readout mirrors profile_k_anonymity: one row
    // per t threshold from a 1-row-aggregate explode.
    "profile_t_closeness" -> { (s, dir) =>
      val cust = Tables(s, dir, "customer").select(col("c_nationkey"),
        floor(col("c_acctbal") / 500).as("band"),
        col("c_mktsegment").as("seg"))
      val bs = cust.groupBy("c_nationkey", "band", "seg")
        .agg(count(lit(1)).as("n_bs"))
      val blocks = bs.groupBy("c_nationkey", "band").agg(sum("n_bs").as("n_b"))
      val segs = cust.groupBy("seg").agg(count(lit(1)).as("n_s"))
      val tot = cust.agg(count(lit(1)).as("n_tot"))
      val grid = blocks.crossJoin(broadcast(segs))
        .join(bs, Seq("c_nationkey", "band", "seg"), "left")
        .withColumn("n_bs", coalesce(col("n_bs"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("num",
          abs(col("n_bs").cast(DecimalType(38, 0)) * col("n_tot") -
            col("n_s").cast(DecimalType(38, 0)) * col("n_b")))
      val tb = grid.groupBy("c_nationkey", "band")
        .agg(sum(col("num")).as("num"), min(col("n_b")).as("n_b"),
          min(col("n_tot")).as("n_tot"))
        .withColumn("t", col("num").cast(DoubleType) /
          (lit(2.0) * col("n_b").cast(DoubleType) *
            col("n_tot").cast(DoubleType)))
      val ts = Seq(0.2, 0.35, 0.5)
      val thAggs = ts.zipWithIndex.flatMap { case (th, i) =>
        Seq(sum(when(col("t") > th, 1L).otherwise(0L)).as(s"blocks_$i"),
          sum(when(col("t") > th, col("n_b")).otherwise(0L)).as(s"rows_$i"))
      }
      val base = Seq(count(lit(1)).as("n_blocks"),
        (round(max(col("t")), 6) + lit(0.0)).as("max_t"))
      val rep = tb.agg((base ++ thAggs).head, (base ++ thAggs).tail: _*)
      val rows = ts.zipWithIndex.map { case (th, i) =>
        struct(lit(th).as("threshold"), col(s"blocks_$i").as("blocks_above"),
          col(s"rows_$i").as("rows_above"))
      }
      rep.select(col("n_blocks"), col("max_t"),
          explode(array(rows: _*)).as("r"))
        .select(col("r.threshold").as("threshold"), col("n_blocks"),
          col("max_t"), col("r.blocks_above").as("blocks_above"),
          col("r.rows_above").as("rows_above"))
        .orderBy("threshold")
    },

    // event-type affinity: Jaccard overlap of the USER SETS behind every
    // type pair — which behaviors co-occur in the same accounts (the
    // cross-sell / feature-bundling signal). The fact table reduces to
    // distinct (type, user) ONCE; the self-join keys on user with
    // fan-out bounded by the type cardinality squared (a dimension, not
    // data volume); totals join back broadcast.
    "events_type_affinity_jaccard" -> { (s, dir) =>
      val tu = Tables(s, dir, "events")
        .select(col("event_type").as("type_a"), col("user_id")).distinct()
      val co = tu
        .join(tu.select(col("type_a").as("type_b"), col("user_id")), "user_id")
        .where(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
      val totals = tu.groupBy("type_a").agg(count(lit(1)).as("n_a"))
      co.join(broadcast(totals), "type_a")
        .join(broadcast(totals.select(col("type_a").as("type_b"),
          col("n_a").as("n_b"))), "type_b")
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_both"),
          (round(col("n_both").cast(DoubleType) /
            (col("n_a") + col("n_b") - col("n_both")).cast(DoubleType), 6)
            + lit(0.0)).as("jaccard"))
        .orderBy("type_a", "type_b")
    }
  )

  val oracle: Map[String, String] = Map(
    "profile_t_closeness" -> {
      val ts = Seq(0.2, 0.35, 0.5)
      val thCols = ts.zipWithIndex.map { case (th, i) =>
        s"""cast(sum(CASE WHEN t > $th THEN 1 ELSE 0 END) AS bigint)
           |    AS blocks_$i,
           |  cast(sum(CASE WHEN t > $th THEN n_b ELSE 0 END) AS bigint)
           |    AS rows_$i""".stripMargin
      }.mkString(",\n  ")
      val perTh = ts.zipWithIndex.map { case (th, i) =>
        s"""SELECT cast($th AS double) AS threshold, n_blocks, max_t,
           |  blocks_$i AS blocks_above, rows_$i AS rows_above FROM rep"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH cust AS (SELECT c_nationkey,
         |    cast(floor(c_acctbal / 500) AS bigint) AS band,
         |    c_mktsegment AS seg FROM customer),
         |bs AS (SELECT c_nationkey, band, seg, cast(count(*) AS bigint)
         |    AS n_bs FROM cust GROUP BY 1, 2, 3),
         |blocks AS (SELECT c_nationkey, band, cast(sum(n_bs) AS bigint)
         |    AS n_b FROM bs GROUP BY 1, 2),
         |segs AS (SELECT seg, cast(count(*) AS bigint) AS n_s
         |  FROM cust GROUP BY 1),
         |tot AS (SELECT cast(count(*) AS bigint) AS n_tot FROM cust),
         |grid AS (SELECT b.c_nationkey, b.band, b.n_b, s.seg, s.n_s, n_tot,
         |    coalesce(bs.n_bs, 0) AS n_bs
         |  FROM blocks b CROSS JOIN segs s CROSS JOIN tot
         |  LEFT JOIN bs ON b.c_nationkey = bs.c_nationkey
         |    AND b.band = bs.band AND s.seg = bs.seg),
         |tb AS (SELECT c_nationkey, band,
         |    cast(sum(abs(cast(n_bs AS hugeint) * n_tot
         |      - cast(n_s AS hugeint) * n_b)) AS double) /
         |      (2.0 * cast(min(n_b) AS double) * cast(min(n_tot) AS double))
         |      AS t,
         |    min(n_b) AS n_b
         |  FROM grid GROUP BY 1, 2),
         |rep AS (SELECT cast(count(*) AS bigint) AS n_blocks,
         |    round(max(t), 6) + 0.0 AS max_t,
         |  $thCols
         |  FROM tb)
         |$perTh
         |ORDER BY threshold""".stripMargin
    },
    "events_type_affinity_jaccard" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |co AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    cast(count(*) AS bigint) AS n_both
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |tt AS (SELECT event_type, cast(count(*) AS bigint) AS n
        |  FROM tu GROUP BY 1)
        |SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_both,
        |  round(cast(n_both AS double) /
        |    cast(ta.n + tb.n - n_both AS double), 6) + 0.0 AS jaccard
        |FROM co JOIN tt ta ON co.type_a = ta.event_type
        |  JOIN tt tb ON co.type_b = tb.event_type
        |ORDER BY type_a, type_b""".stripMargin
  )
}
