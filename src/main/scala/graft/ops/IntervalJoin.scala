package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — both sides are INTERVALS (start, end) and the
  * predicate is `a.s < b.e AND b.s < a.e`, the operator behind
  * concurrent-session analytics, meeting detection, and time-range
  * conflict checks. Spark has no native interval join: the naive form is
  * a theta join, which plans a per-partition nested loop.
  *
  * Scale shape (the join_theta_range discipline, extended to two interval
  * sides): bucket TIME into fixed-width cells, replicate each interval to
  * every cell it touches (bounded by interval span / cell width), and
  * equi-join on (partition key, cell) with the exact overlap predicate as
  * a residual. A pair sharing k cells would emit k copies — instead of a
  * DISTINCT repair, each pair is counted ONLY in its first shared cell
  * (`cell == cell(max(starts))`, which both intervals contain iff they
  * overlap), so the join output is exact by construction and the
  * downstream aggregate never sees duplicates. Shuffle key is the dense
  * (partition, cell) composite — skew bounded by per-cell activity, not
  * per-key history.
  */
object IntervalJoin {

  /** PUBLIC API: exact interval-overlap self-join. `df` carries one
    * interval per row: `idCol`, `partCols` (equality dimensions, e.g. the
    * day), `startCol`/`endCol` as epoch SECONDS (bigint). Returns each
    * unordered overlapping pair (id_a < id_b) exactly once with its
    * overlap length. `cellSeconds` is the bucket width: replication
    * factor = interval span / cellSeconds (cap spans upstream). */
  def overlapSelfJoin(df: DataFrame, idCol: String, partCols: Seq[String],
      startCol: String, endCol: String,
      cellSeconds: Long = 3600L): DataFrame = {
    require(cellSeconds >= 1, s"cellSeconds must be >= 1, got $cellSeconds")
    // integral DIV throughout — epoch/width via `/` would roundtrip a
    // double and invite off-by-one cells at exact boundaries
    val cells = df.withColumn("__cell",
      explode(sequence(expr(s"$startCol DIV $cellSeconds"),
        expr(s"$endCol DIV $cellSeconds"))))
    def side(tag: String) = cells.select(
      (partCols :+ "__cell").map(col) ++ Seq(
        col(idCol).as(s"${idCol}_$tag"), col(startCol).as(s"s_$tag"),
        col(endCol).as(s"e_$tag")): _*)
    side("a").join(side("b"), partCols :+ "__cell")
      .where(col(s"${idCol}_a") < col(s"${idCol}_b") &&
        col("s_a") < col("e_b") && col("s_b") < col("e_a") &&
        // first-shared-cell ownership: count each pair exactly once
        col("__cell") === expr(s"greatest(s_a, s_b) DIV $cellSeconds"))
      .withColumn("overlap_s",
        least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")))
      .drop("__cell")
  }

  val queries: Map[String, Q] = Map(
    // concurrent-activity report: daily activity intervals of engaged
    // users (≥ 5 events that day), all same-day overlapping user pairs,
    // rolled up per day. Every emitted number is integral (epoch-second
    // arithmetic) — no float discipline needed. The oracle is the plain
    // theta join: the bucketed form may only reproduce it.
    "join_interval_overlap" -> { (s, dir) =>
      val iv = Tables(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(epochS(col("ts"))).as("s"), max(epochS(col("ts"))).as("e"),
          count(lit(1)).as("n"))
        .where(col("n") >= 5)
        .drop("n")
        .localCheckpoint(false) // feeds both sides of the self-join
      overlapSelfJoin(iv, "user_id", Seq("day"), "s", "e", 3600L)
        .groupBy("day")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("overlap_s")).as("total_overlap_s"),
          max(col("overlap_s")).as("max_overlap_s"))
        .orderBy("day")
    }
  )

  val oracle: Map[String, String] = Map(
    "join_interval_overlap" ->
      """WITH e0 AS (SELECT user_id, cast(cast(ts as timestamp) as date) AS day,
        |    cast(epoch(date_trunc('second', cast(ts as timestamp))) as bigint) AS es
        |  FROM events),
        |iv AS (SELECT user_id, day, min(es) AS s, max(es) AS e
        |       FROM e0 GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT a.day, count(*) AS n_pairs,
        |  cast(sum(least(a.e, b.e) - greatest(a.s, b.s)) as bigint) AS total_overlap_s,
        |  cast(max(least(a.e, b.e) - greatest(a.s, b.s)) as bigint) AS max_overlap_s
        |FROM iv a JOIN iv b ON a.day = b.day AND a.user_id < b.user_id
        |  AND a.s < b.e AND b.s < a.e
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
