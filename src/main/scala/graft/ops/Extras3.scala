package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** Multiset set-operations (ALL variants preserve duplicates — bag
  * semantics) and the second string-function suite (translate/repeat/
  * reverse/instr/left/right/replace — no initcap: absent in DuckDB 1.0).
  */
object Extras3 {

  val queries: Map[String, Q] = Map(
    "set_intersect_all" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.intersectAll(su)
        .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"))
    },

    "set_except_all" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.exceptAll(su)
        .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"))
    },

    "fn_string_suite2" -> { (s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
        repeat(col("p_brand"), 2).as("brand2"),
        reverse(col("p_name")).as("name_rev"),
        instr(col("p_name"), "o").as("first_o"),
        substring(col("p_name"), 1, 3).as("left3"),
        col("p_name").substr(length(col("p_name")) - 2, lit(3)).as("right3"),
        regexp_replace(col("p_name"), "widget", "gadget").as("renamed"))
        .orderBy(col("p_partkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "set_intersect_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey FROM supplier
        |) GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "set_except_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey FROM supplier
        |) GROUP BY nationkey ORDER BY nationkey""".stripMargin,
    "fn_string_suite2" ->
      """SELECT p_partkey,
        |translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        |repeat(p_brand, 2) AS brand2,
        |reverse(p_name) AS name_rev,
        |cast(strpos(p_name, 'o') as int) AS first_o,
        |substring(p_name, 1, 3) AS left3,
        |right(p_name, 3) AS right3,
        |replace(p_name, 'widget', 'gadget') AS renamed
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
