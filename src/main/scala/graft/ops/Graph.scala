package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Graph analytics over co-occurrence graphs — the family a training-data
  * engine needs for catalog/entity structure: build an item-item graph
  * from (basket, item) facts, then degree/wedge/triangle statistics.
  *
  * Scale shape: the edge builder's self-join is WITHIN a basket — the
  * pair expansion is bounded by basket size squared (baskets here are
  * orders with ≤ 7 items), map-side bounded exactly like the shingle
  * builders. The `minWeight` filter then shrinks the graph to edges
  * observed repeatedly (random one-off co-occurrence is noise at any
  * scale), and every downstream join runs on that reduced edge table —
  * unhinted, so AQE broadcasts while it is small and degrades to shuffle
  * joins when it is not (the verifyCandidates discipline). The
  * wedge/triangle counting itself is the standard a<b<c oriented-join
  * formulation: each triangle counted exactly once, no DISTINCT repair.
  */
object Graph {

  /** PUBLIC API: weighted co-occurrence edges — item pairs sharing at
    * least `minWeight` groups. Output (pa, pb, w) with pa < pb.
    *
    * One shuffle to the group grain (collect_set), then the pair
    * expansion runs MAP-SIDE through the native [[graft.functions
    * .ArrayPairs]] expression (sorted distinct array → all pa < pb
    * pairs in one codegen'd loop) — the relational self-join form pays
    * a second full shuffle plus the join for the same pairs. Pair count
    * per group is |group|²/2: bounded by basket size by contract. */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
      minWeight: Long): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val pairs = ColumnBridge.column(graft.functions.ArrayPairs(
      ColumnBridge.expression(col("__is"))))
    df.select(col(groupCol).as("__g"), col(itemCol).cast("long").as("__i"))
      .groupBy("__g")
      .agg(sort_array(collect_set(col("__i"))).as("__is"))
      .select(explode(pairs).as("__p"))
      .select(col("__p.pa").as("pa"), col("__p.pb").as("pb"))
      .groupBy("pa", "pb")
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= minWeight)
  }

  /** PUBLIC API: one-row global graph statistics — nodes, edges, wedges
    * (paths of length 2: Σ d(d−1)/2), triangles (oriented 3-join), and
    * the global clustering coefficient 3·triangles/wedges. */
  def triangleStats(edges: DataFrame): DataFrame = {
    // the edge table feeds FIVE plan branches (degree union ×2, the
    // three-way triangle join, the edge count) — materialize it once
    // instead of replaying the caller's (possibly fact-scale) build per
    // branch. Lazy localCheckpoint: the connectedComponents lineage
    // discipline; blocks reclaimed when the result is dereferenced.
    val e = edges.select("pa", "pb").localCheckpoint(false)
    val deg = e.select(col("pa").as("p"))
      .unionAll(e.select(col("pb").as("p")))
      .groupBy("p").agg(count(lit(1)).as("d"))
    // keep the wedge count integral end-to-end (DIV, not the
    // double-returning `/`): sum d(d−1) is even, DIV 2 is exact
    val wedges = deg.agg(
      expr("CAST(sum(d * (d - 1)) DIV 2 AS bigint)").as("n_wedges"),
      count(lit(1)).as("n_nodes"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.pb") === col("e2.pa"))
      .join(e.as("e3"),
        col("e1.pa") === col("e3.pa") && col("e2.pb") === col("e3.pb"))
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    wedges.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
      .withColumn("clustering",
        (col("n_triangles").cast(DoubleType) * 3.0) /
          col("n_wedges").cast(DoubleType))
      .select("n_nodes", "n_edges", "n_wedges", "n_triangles", "clustering")
  }

  // edge build materialized once per query (the degree union alone would
  // otherwise replay the fact-scale pair expansion per branch)
  private def strongEdges(s: org.apache.spark.sql.SparkSession, dir: String) =
    coOccurrenceEdges(Tables(s, dir, "lineitem"), "l_orderkey", "l_partkey", 2L)
      .localCheckpoint(false)

  val queries: Map[String, Q] = Map(
    // parts co-purchased in ≥ 2 orders: global structure of the strong
    // co-purchase graph. sum(d(d−1)) stays integral until one DIV 2;
    // clustering is the single double division at the end.
    "graph_triangle_stats" -> { (s, dir) => triangleStats(strongEdges(s, dir)) },

    // hub parts: top-10 strong-edge degrees. orderBy+limit →
    // TakeOrderedAndProject (distributed top-k, never a global sort).
    "graph_degree_topk" -> { (s, dir) =>
      val e = strongEdges(s, dir)
      e.select(col("pa").as("p"))
        .unionAll(e.select(col("pb").as("p")))
        .groupBy("p").agg(count(lit(1)).as("degree"))
        .orderBy(col("degree").desc, col("p"))
        .limit(10)
    }
  )

  private val sqlEdges =
    """edges AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "graph_triangle_stats" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |$sqlEdges,
         |nodes AS (SELECT pa AS p FROM edges UNION ALL SELECT pb FROM edges),
         |deg AS (SELECT p, count(*) AS d FROM nodes GROUP BY 1),
         |w AS (SELECT cast(sum(d * (d - 1)) // 2 as bigint) AS n_wedges,
         |             count(*) AS n_nodes FROM deg),
         |tri AS (SELECT count(*) AS n_triangles FROM edges e1
         |        JOIN edges e2 ON e1.pb = e2.pa
         |        JOIN edges e3 ON e1.pa = e3.pa AND e2.pb = e3.pb),
         |ne AS (SELECT count(*) AS n_edges FROM edges)
         |SELECT n_nodes, n_edges, n_wedges, n_triangles,
         |  cast(n_triangles as double) * 3.0 / cast(n_wedges as double)
         |    AS clustering
         |FROM w CROSS JOIN ne CROSS JOIN tri""".stripMargin,
    "graph_degree_topk" ->
      s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |$sqlEdges,
         |nodes AS (SELECT pa AS p FROM edges UNION ALL SELECT pb FROM edges)
         |SELECT p, count(*) AS degree FROM nodes GROUP BY 1
         |ORDER BY degree DESC, p LIMIT 10""".stripMargin
  )
}
