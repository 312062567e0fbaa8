package graft.clean

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Categorical feature encoding — the ML-preprocessing step between
  * cleaning and training:
  *
  *   - one-hot indicators over a KNOWN category domain (map-side only;
  *     an open domain would go through `reshape_pivot`'s dynamic
  *     pivot, paying a values-discovery pass first);
  *   - leave-one-out target-mean encoding — the high-cardinality
  *     alternative one-hot can't serve: each row gets its category's
  *     target mean EXCLUDING itself ((Σ_g − y)/(n_g − 1)), the standard
  *     guard against the target leaking into its own feature.
  *
  * Scale: both are one map-side pass; target encoding's only shuffle is
  * the category-grain aggregate (dimension-sized, broadcast back — the
  * fillna_mean_by_group join shape, never a per-row window).
  *
  * Float discipline: category sums are exact DECIMAL(18,4) (cast to
  * double below 2⁵³ — exact); the LOO expression is then a fixed IEEE
  * tree over identical doubles, so no rounding is needed.
  */
object Encode {

  private val segments =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  val queries: Map[String, Q] = Map(

    "encode_onehot" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val indicators = segments.map(seg =>
        when(col("c_mktsegment") === seg, 1L).otherwise(0L)
          .as(s"is_${seg.toLowerCase}"))
      c.select(col("c_custkey") +: indicators: _*)
        .orderBy("c_custkey")
    },

    "encode_target_mean" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val joined = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
          col("o_totalprice").as("y"))
      val stats = joined.groupBy("seg").agg(
        sum(col("y").cast(DecimalType(18, 4))).cast(DoubleType).as("sy"),
        count(lit(1)).as("n"))
      joined.join(broadcast(stats), "seg")
        .select(col("o_orderkey"), col("seg"),
          ((col("sy") - col("y")) / (col("n") - 1)).as("enc"))
        .orderBy("o_orderkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "encode_onehot" -> {
      val cols = segments.map(seg =>
        s"CASE WHEN c_mktsegment = '$seg' THEN 1 ELSE 0 END AS is_${seg.toLowerCase}")
        .mkString(",\n|  ")
      s"""SELECT c_custkey,
         |  $cols
         |FROM customer ORDER BY c_custkey""".stripMargin
    },
    "encode_target_mean" ->
      """WITH j AS (
        |  SELECT o_orderkey, c_mktsegment AS seg, o_totalprice AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT seg,
        |        cast(sum(cast(y AS decimal(18,4))) AS double) AS sy,
        |        cast(count(*) AS bigint) AS n
        |      FROM j GROUP BY seg)
        |SELECT o_orderkey, j.seg, (sy - y) / (n - 1) AS enc
        |FROM j JOIN g ON j.seg = g.seg
        |ORDER BY o_orderkey""".stripMargin
  )
}
