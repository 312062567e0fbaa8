package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Additional coverage: frame-navigation window functions, cryptographic
  * hash functions (portable hex digests), and Pearson correlation computed
  * from EXACT decimal sums — the built-in `corr` aggregates doubles
  * non-associatively (partition-order-dependent), so the deterministic form
  * is corr = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) over decimal
  * sums, identical in both engines.
  */
object Extras {

  val queries: Map[String, Q] = Map(
    "window_first_last_nth" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(wFull).as("first_key"),
          last(col("o_orderkey")).over(wFull).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    "fn_hash_suite" -> { (s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"),
        md5(col("p_name").cast("binary")).as("h_md5"),
        sha2(col("p_name").cast("binary"), 256).as("h_sha256"))
        .orderBy(col("p_partkey"))
    },

    // bitwise operators over bigints — pure map-side codegen expressions
    "fn_bitwise_suite" -> { (s, dir) =>
      Tables(s, dir, "events").select(
        col("event_id"),
        col("event_id").bitwiseAND(col("user_id")).as("b_and"),
        col("event_id").bitwiseOR(col("user_id")).as("b_or"),
        col("event_id").bitwiseXOR(col("user_id")).as("b_xor"),
        shiftleft(col("user_id"), 3).as("b_shl"),
        shiftright(col("event_id"), 2).as("b_shr"),
        expr("cast(bit_count(event_id) as bigint)").as("b_cnt"))
        .orderBy(col("event_id"))
    },

    "agg_corr_manual" -> { (s, dir) =>
      val x = col("l_quantity").cast("decimal(12,2)")
      val y = col("l_extendedprice").cast("decimal(12,2)")
      Tables(s, dir, "lineitem")
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sx2"),
          sum(y * y).cast("double").as("sy2"))
        .select(col("n"),
          // + 0.0 normalizes IEEE -0.0 on a near-zero correlation
          (round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sx2") - col("sx") * col("sx")) *
              sqrt(col("n") * col("sy2") - col("sy") * col("sy"))), 6)
            + lit(0.0)).as("corr_qty_price"))
    }
  )

  val oracle: Map[String, String] = Map(
    "window_first_last_nth" ->
      """SELECT o_custkey, o_orderkey,
        |first_value(o_orderkey) OVER w AS first_key,
        |last_value(o_orderkey) OVER w AS last_key,
        |nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "fn_hash_suite" ->
      """SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_bitwise_suite" ->
      """SELECT event_id,
        |event_id & user_id AS b_and,
        |event_id | user_id AS b_or,
        |xor(event_id, user_id) AS b_xor,
        |user_id << 3 AS b_shl,
        |event_id >> 2 AS b_shr,
        |cast(bit_count(event_id) as bigint) AS b_cnt
        |FROM events ORDER BY event_id""".stripMargin,
    "agg_corr_manual" ->
      """WITH s AS (SELECT count(*) AS n,
        |  cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sx,
        |  cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sy,
        |  cast(sum(cast(l_quantity as decimal(12,2)) * cast(l_extendedprice as decimal(12,2))) as double) AS sxy,
        |  cast(sum(cast(l_quantity as decimal(12,2)) * cast(l_quantity as decimal(12,2))) as double) AS sx2,
        |  cast(sum(cast(l_extendedprice as decimal(12,2)) * cast(l_extendedprice as decimal(12,2))) as double) AS sy2
        |  FROM lineitem)
        |SELECT n, round((n * sxy - sx * sy) /
        |  (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 6) + 0.0
        |  AS corr_qty_price
        |FROM s""".stripMargin
  )
}
