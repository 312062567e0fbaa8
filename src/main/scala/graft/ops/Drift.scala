package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Distribution-drift detection — the monitoring layer a production data
  * pipeline runs between ingests: did today's data stop looking like the
  * data the models/cleaning rules were built on?
  *
  * Two classic statistics over the orders fact split at 1998-01-01
  * (reference = earlier, current = later):
  *
  *   - PSI (population stability index): binned Σ (p_cur − p_ref)·ln(p_cur/p_ref)
  *     — THE industry drift score for scorecard monitoring;
  *   - KS (Kolmogorov-Smirnov) statistic: max |ECDF_ref − ECDF_cur| —
  *     the bin-free supremum distance.
  *
  * Scale discipline: PSI's only full-data pass is a map-side-combinable
  * count per (10-bin, side) — everything after is a 10-row frame. KS
  * needs global cumulative counts over the distinct-value spine; that
  * runs through the two-level distributed prefix sum
  * ([[graft.GraftOps.distributedRunningSum]]), never a single-partition
  * window, and ends in one max aggregate. Totals attach as broadcast
  * 1-row PROJECTIONS (never a both-sides filter — the conditioned-BNLJ
  * trap).
  *
  * Float discipline: bin ids and counts are integral; probabilities are
  * single IEEE divisions of exact bigints (identical in both engines);
  * each ln-bearing PSI term is cast to DECIMAL(18,12) before the
  * (associative, exact) sum — ln is not correctly rounded in libm, the
  * 1e-12 quantization absorbs the cross-engine last-ulp (the LM-surprisal
  * discipline). The KS max runs over bit-identical doubles.
  */
object Drift {

  private val splitTs = "1998-01-01"

  /** 10 fixed-width o_totalprice bins (domain [0, 500k), width 50k) with
    * per-side counts over a broadcast bin spine, so bins empty on BOTH
    * sides still appear. The 10-row frame feeds three consumers (totals,
    * per-bin rows, the total row) — checkpointed so the orders fact is
    * scanned once, not re-derived per consumer (exchange reuse does not
    * fire across the differently-shaped subtrees). */
  private def binnedSplit(s: SparkSession, dir: String): DataFrame = {
    val binned = Tables(s, dir, "orders").select(
      floor(col("o_totalprice") / 50000).cast("long").as("bin"),
      when(col("o_orderdate") < lit(splitTs).cast("timestamp"), 1L)
        .otherwise(0L).as("r"))
    val counts = binned.groupBy("bin").agg(
      sum(col("r")).as("n_ref"), sum(lit(1L) - col("r")).as("n_cur"))
    s.range(0, 10).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .localCheckpoint(false)
  }

  /** Laplace-smoothed (+1/+10) per-side probabilities + a decimal-cast
    * divergence term, one total row (bin = -1) carrying the statistic. */
  private def divergenceRows(perBin: DataFrame,
      term: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column, outCol: String): DataFrame = {
    val tot = perBin.agg(sum("n_ref").as("nrt"), sum("n_cur").as("nct"))
    val pr = (col("n_ref") + lit(1L)) / (col("nrt") + lit(10L))
    val pc = (col("n_cur") + lit(1L)) / (col("nct") + lit(10L))
    val rows = perBin.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        pr.as("p_ref"), pc.as("p_cur"),
        term(pr, pc).cast(DecimalType(18, 12)).as("term"))
    val total = rows.agg(
      lit(-1L).as("bin"), sum("n_ref").as("n_ref"), sum("n_cur").as("n_cur"),
      lit(1.0).as("p_ref"), lit(1.0).as("p_cur"),
      sum(col("term")).cast(DecimalType(18, 12)).as("term"))
    rows.unionByName(total)
      .select(col("bin"), col("n_ref"), col("n_cur"), col("p_ref"),
        col("p_cur"), col("term").cast(DoubleType).as(outCol))
      .orderBy("bin")
  }

  val queries: Map[String, Q] = Map(

    "drift_psi" -> { (s, dir) =>
      divergenceRows(binnedSplit(s, dir),
        (pr, pc) => (pc - pr) * log(pc / pr), "psi_term")
    },

    // Jensen-Shannon divergence over the same split: symmetric, bounded
    // [0, ln 2] — the spike-robust companion to PSI (whose ln ratio
    // explodes on near-empty bins; JS's mixture denominator cannot).
    "drift_js" -> { (s, dir) =>
      divergenceRows(binnedSplit(s, dir),
        (pr, pc) => {
          val m = (pr + pc) / 2.0
          (pr * log(pr / m) + pc * log(pc / m)) / 2.0
        }, "js_term")
    },

    // KS statistic over the full o_totalprice distribution: cumulative
    // side-counts on the distinct-value spine via the distributed prefix
    // sum, ECDFs as exact-int divisions, one max. Single-row output.
    "drift_ks" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val sides = o.select(col("o_totalprice").as("v"),
        when(col("o_orderdate") < lit(splitTs).cast("timestamp"), 1L)
          .otherwise(0L).as("r"))
      // ONE kernel invocation for the ECDF pair: both cumulatives share
      // the range exchange, offsets aggregate, and window pass (two
      // chained calls paid 2× of each, and the second input carried the
      // first's output column — the non-slim localCheckpoint path).
      val perV = sides.groupBy("v").agg(
        sum(col("r")).as("nr"), sum(lit(1L) - col("r")).as("nc"))
        .withColumn("g", lit(1))
      val cum = GraftOps.distributedRunningSums(
        perV, "g", "v", Seq("nr" -> "cr", "nc" -> "cc"))
      val tot = perV.agg(sum("nr").as("nrt"), sum("nc").as("nct"))
      cum.crossJoin(broadcast(tot))
        .select(col("nrt"), col("nct"),
          abs(col("cr") / col("nrt") - col("cc") / col("nct")).as("d"))
        .agg(max(col("nrt")).as("n_ref"), max(col("nct")).as("n_cur"),
          max(col("d")).as("ks"))
    }
  )

  val oracle: Map[String, String] = Map(
    "drift_psi" ->
      s"""WITH b AS (
         |  SELECT cast(floor(o_totalprice / 50000) AS bigint) AS bin,
         |         CASE WHEN o_orderdate < TIMESTAMP '$splitTs' THEN 1 ELSE 0 END AS r
         |  FROM orders),
         |c AS (SELECT bin, cast(sum(r) AS bigint) AS n_ref,
         |             cast(sum(1 - r) AS bigint) AS n_cur
         |      FROM b GROUP BY bin),
         |spine AS (SELECT unnest(range(0, 10)) AS bin),
         |pb AS (SELECT spine.bin, coalesce(n_ref, 0) AS n_ref,
         |              coalesce(n_cur, 0) AS n_cur
         |       FROM spine LEFT JOIN c ON spine.bin = c.bin),
         |t AS (SELECT cast(sum(n_ref) AS bigint) AS nrt,
         |             cast(sum(n_cur) AS bigint) AS nct FROM pb),
         |rows_ AS (
         |  SELECT pb.bin, pb.n_ref, pb.n_cur,
         |    (pb.n_ref + 1) / (t.nrt + 10) AS p_ref,
         |    (pb.n_cur + 1) / (t.nct + 10) AS p_cur,
         |    cast(((pb.n_cur + 1) / (t.nct + 10) - (pb.n_ref + 1) / (t.nrt + 10))
         |      * ln(((pb.n_cur + 1) / (t.nct + 10)) / ((pb.n_ref + 1) / (t.nrt + 10)))
         |      AS decimal(18,12)) AS term
         |  FROM pb CROSS JOIN t)
         |SELECT bin, n_ref, n_cur, p_ref, p_cur,
         |       cast(term AS double) AS psi_term FROM rows_
         |UNION ALL
         |SELECT -1, cast(sum(n_ref) AS bigint), cast(sum(n_cur) AS bigint),
         |       1.0, 1.0, cast(cast(sum(term) AS decimal(18,12)) AS double)
         |FROM rows_
         |ORDER BY bin""".stripMargin,
    "drift_js" ->
      s"""WITH b AS (
         |  SELECT cast(floor(o_totalprice / 50000) AS bigint) AS bin,
         |         CASE WHEN o_orderdate < TIMESTAMP '$splitTs' THEN 1 ELSE 0 END AS r
         |  FROM orders),
         |c AS (SELECT bin, cast(sum(r) AS bigint) AS n_ref,
         |             cast(sum(1 - r) AS bigint) AS n_cur
         |      FROM b GROUP BY bin),
         |spine AS (SELECT unnest(range(0, 10)) AS bin),
         |pb AS (SELECT spine.bin, coalesce(n_ref, 0) AS n_ref,
         |              coalesce(n_cur, 0) AS n_cur
         |       FROM spine LEFT JOIN c ON spine.bin = c.bin),
         |t AS (SELECT cast(sum(n_ref) AS bigint) AS nrt,
         |             cast(sum(n_cur) AS bigint) AS nct FROM pb),
         |probs AS (
         |  SELECT pb.bin, pb.n_ref, pb.n_cur,
         |    (pb.n_ref + 1) / (t.nrt + 10) AS p_ref,
         |    (pb.n_cur + 1) / (t.nct + 10) AS p_cur
         |  FROM pb CROSS JOIN t),
         |rows_ AS (
         |  SELECT bin, n_ref, n_cur, p_ref, p_cur,
         |    cast((p_ref * ln(p_ref / ((p_ref + p_cur) / 2.0))
         |        + p_cur * ln(p_cur / ((p_ref + p_cur) / 2.0))) / 2.0
         |      AS decimal(18,12)) AS term
         |  FROM probs)
         |SELECT bin, n_ref, n_cur, p_ref, p_cur,
         |       cast(term AS double) AS js_term FROM rows_
         |UNION ALL
         |SELECT -1, cast(sum(n_ref) AS bigint), cast(sum(n_cur) AS bigint),
         |       1.0, 1.0, cast(cast(sum(term) AS decimal(18,12)) AS double)
         |FROM rows_
         |ORDER BY bin""".stripMargin,
    "drift_ks" ->
      s"""WITH b AS (
         |  SELECT o_totalprice AS v,
         |         CASE WHEN o_orderdate < TIMESTAMP '$splitTs' THEN 1 ELSE 0 END AS r
         |  FROM orders),
         |c AS (SELECT v, cast(sum(r) AS bigint) AS nr,
         |             cast(sum(1 - r) AS bigint) AS nc
         |      FROM b GROUP BY v),
         |w AS (SELECT v,
         |        cast(sum(nr) OVER (ORDER BY v) AS bigint) AS cr,
         |        cast(sum(nc) OVER (ORDER BY v) AS bigint) AS cc
         |      FROM c),
         |t AS (SELECT cast(sum(nr) AS bigint) AS nrt,
         |             cast(sum(nc) AS bigint) AS nct FROM c)
         |SELECT max(t.nrt) AS n_ref, max(t.nct) AS n_cur,
         |       max(abs(cr / t.nrt - cc / t.nct)) AS ks
         |FROM w CROSS JOIN t""".stripMargin
  )
}
