package graft.ops

import graft._
import org.apache.spark.sql.functions._

/** §2.6 sort / limit / top-k / set ops.
  *
  * `sort_limit_topk` compiles to TakeOrderedAndProjectExec — per-partition
  * top-k then a driver merge of k·partitions rows, never a global sort;
  * that is the shape that survives 100 TB.
  */
object SortSet {

  val queries: Map[String, Q] = Map(
    "sort_limit_topk" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    },

    "set_union_all" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"))
      val su = Tables(s, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_name").as("name"),
          col("s_acctbal").as("acctbal"))
      c.unionByName(su).orderBy(col("key"), col("name"))
    },

    "set_union_distinct" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(su).distinct().orderBy(col("nationkey"))
    },

    "set_intersect" -> { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    },

    "set_except" -> { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "set_union_all" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal FROM customer
        |  UNION ALL
        |  SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |) ORDER BY key, name""".stripMargin,
    "set_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin
  )
}
