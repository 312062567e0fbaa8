package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.12 embedding similarity: exact cosine (higher-order functions, no
  * UDF), blocked all-pairs, brute-force kNN baseline, IVF-style ANN, and
  * cosine-threshold dedup.
  *
  * Float32 embeddings are cast element-wise to double BEFORE any arithmetic
  * (both engines) and normalized to unit length ONCE per vector — cosine is
  * then a single dot product per pair (higher-order functions are
  * interpreted, not codegen'd, so folds-per-pair is the perf lever). Every
  * expression shape is mirrored against DuckDB list_dot_product /
  * list_transform so the doubles agree bit-for-bit before round(…, 6).
  *
  * Scale: `sim_cosine_pairs` blocks on `label`; `sim_knn_topk` is the
  * brute-force baseline kernel (per-partition top-k then merge);
  * `sim_ann_ivf` is the scale path — assign every vector to its nearest
  * centroid, probe only the best 2 clusters per query (REPOSE-style
  * reference-point partitioning, PAPERS.md).
  */
object Similarity {

  /** PUBLIC API: attach unit-normalized double vector `v` computed from
    * `raw` — one native codegen pass per row ([[graft.functions.UnitVector]];
    * same cast → ascending Σx² → divide order as the HOF chain it replaced,
    * so doubles are bit-identical; ExpressionsSpec asserts it). */
  def withUnit(df: DataFrame, raw: Column): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.withColumn("v", ColumnBridge.column(
      graft.functions.UnitVector(ColumnBridge.expression(raw))))
  }

  /** embeddings as double unit vectors. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    withUnit(Tables(s, dir, "embeddings"), col("embedding"))
      .select(col("vec_id"), col("label"), col("v"))

  /** PUBLIC API: cos of unit vectors = plain dot — evaluated by the native
    * codegen DotProduct expression (graft.functions); ascending-index
    * summation, bit-identical to the HOF fold and DuckDB's
    * list_dot_product. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** DuckDB mirror: unit-normalized double vector from `embedding`.
    * private[llm]: Dedup2's sign-LSH oracle reuses it — one copy only. */
  private[llm] def sqlUnit(src: String): String =
    s"""list_transform(list_transform($src, x -> cast(x as double)),
       |  x -> x / sqrt(list_dot_product(list_transform($src, x -> cast(x as double)),
       |                                 list_transform($src, x -> cast(x as double)))))""".stripMargin

  private val sqlVecs =
    s"SELECT vec_id, label, ${sqlUnit("embedding")} AS v FROM embeddings"

  private def cosSql(a: String, b: String): String = s"list_dot_product($a, $b)"

  /** PUBLIC API: exact top-k neighbours per query. `queries`/`candidates`
    * carry unit vectors from [[withUnit]] as (qid, qv) / (vec_id, v);
    * per-partition heap + merge via row_number, never a global sort. */
  def topKNeighbors(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    queries.crossJoin(candidates).where(col("vec_id") =!= col("qid"))
      .withColumn("cos", round(cosine(col("qv"), col("v")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** PUBLIC API: all pairs within `blockCol` whose cosine ≥ threshold;
    * inputs carry unit vectors as (vec_id, <blockCol>, v). */
  def thresholdPairs(df: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol), col("vec_id").as("id_a"), col("v").as("va"))
    val b = df.select(col(blockCol).as("__blk"), col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col(blockCol) === col("__blk") && col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("va"), col("vb")), 6))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  val queries: Map[String, Q] = Map(
    // exact cosine for all same-label pairs, top-100
    "sim_cosine_pairs" -> { (s, dir) =>
      val a = vecs(s, dir).select(col("label"), col("vec_id").as("id_a"), col("v").as("va"))
      val b = vecs(s, dir).select(col("label").as("lb"), col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("label") === col("lb") && col("id_a") < col("id_b"))
        .select(col("label"), col("id_a"), col("id_b"),
          round(cosine(col("va"), col("vb")), 6).as("cos"))
        .orderBy(col("cos").desc, col("id_a"), col("id_b"))
        .limit(100)
    },

    // brute-force exact kNN: queries = vec_id % 50 = 0, k = 5
    "sim_knn_topk" -> { (s, dir) =>
      val q = vecs(s, dir).where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val c = vecs(s, dir).select(col("vec_id"), col("v"))
      topKNeighbors(q, c, 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rank"))
    },

    // cosine-threshold dedup over vectors ∪ deterministic near-dup copies
    // (the base table has no cos ≥ 0.95 pairs — copies at vec_id+1000000
    // with a 1.01× scale exercise the operator end-to-end; scaling doesn't
    // change the unit vector except in float rounding)
    "dedup_embedding_threshold" -> { (s, dir) =>
      val base = vecs(s, dir)
      val copies = withUnit(
        Tables(s, dir, "embeddings").where(col("vec_id") % 10 === 0),
        transform(col("embedding"), x => x.cast("double") * 1.01))
        .select((col("vec_id") + 1000000L).as("vec_id"), col("label"), col("v"))
      val all = base.unionByName(copies)
      thresholdPairs(all, "label", 0.95)
        .orderBy(col("id_a"), col("id_b"))
    },

    // IVF-style ANN: centroids = vec_id % 97 = 0; every vector is assigned
    // to its nearest centroid; each query probes its 2 best clusters only.
    "sim_ann_ivf" -> { (s, dir) =>
      val all = vecs(s, dir)
      val cents = all.where(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      // nearest-centroid assignment as a map-side-combinable aggregate:
      // max_by over (ccos, -cid) ≡ the (ccos DESC, cid ASC) argmin window,
      // but partial aggregation collapses the ×|centroids| inflation BEFORE
      // the shuffle — only |vectors| rows move (the window form shuffled
      // all inflated rows, then sorted each group).
      val assigned = all.crossJoin(broadcast(cents))
        .withColumn("ccos", round(cosine(col("v"), col("cv")), 6))
        .groupBy(col("vec_id"))
        .agg(first(col("v")).as("v"),
          max_by(col("cid"), struct(col("ccos"), (-col("cid")).as("nc"))).as("cid"))
        .select(col("vec_id"), col("v"), col("cid"))
      val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
      val probes = all.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("qcos", round(cosine(col("qv"), col("cv")), 6))
        .withColumn("prn", row_number().over(wProbe))
        .where(col("prn") <= 2)
        .select(col("qid"), col("qv"), col("cid"))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      // the probe set is |queries|×2 rows — broadcast it so `assigned`
      // (every vector) streams map-side instead of shuffling on cid
      broadcast(probes).join(assigned, "cid")
        .where(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(cosine(col("qv"), col("v")), 6))
        .withColumn("rank", row_number().over(wTop))
        .where(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rank"))
    }
  )

  val oracle: Map[String, String] = Map(
    "sim_cosine_pairs" ->
      s"""WITH e AS ($sqlVecs)
         |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.v", "b.v")}, 6) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |ORDER BY cos DESC, id_a, id_b LIMIT 100""".stripMargin,
    "sim_knn_topk" ->
      s"""WITH e AS ($sqlVecs),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 50 = 0),
         |scored AS (SELECT qid, e.vec_id,
         |    round(${cosSql("qv", "e.v")}, 6) AS cos
         |  FROM q CROSS JOIN e WHERE e.vec_id <> qid),
         |ranked AS (SELECT qid, vec_id, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM scored)
         |SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "dedup_embedding_threshold" ->
      s"""WITH base AS ($sqlVecs),
         |copies AS (SELECT vec_id + 1000000 AS vec_id, label,
         |    ${sqlUnit("list_transform(embedding, x -> cast(x as double) * 1.01)")} AS v
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |e AS (SELECT * FROM base UNION ALL SELECT * FROM copies)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.v", "b.v")}, 6) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(${cosSql("a.v", "b.v")}, 6) >= 0.95
         |ORDER BY id_a, id_b""".stripMargin,
    "sim_ann_ivf" ->
      s"""WITH e AS ($sqlVecs),
         |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 97 = 0),
         |assigned AS (SELECT vec_id, v, cid FROM (
         |  SELECT e.vec_id, e.v, c.cid,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.v", "c.cv")}, 6) DESC, c.cid) AS arn
         |  FROM e CROSS JOIN cents c) WHERE arn = 1),
         |probes AS (SELECT qid, qv, cid FROM (
         |  SELECT q.vec_id AS qid, q.v AS qv, c.cid,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSql("q.v", "c.cv")}, 6) DESC, c.cid) AS prn
         |  FROM e q CROSS JOIN cents c WHERE q.vec_id % 50 = 0) WHERE prn <= 2),
         |scored AS (SELECT p.qid, a.vec_id,
         |    round(${cosSql("p.qv", "a.v")}, 6) AS cos
         |  FROM probes p JOIN assigned a USING (cid) WHERE a.vec_id <> p.qid),
         |ranked AS (SELECT qid, vec_id, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM scored)
         |SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin
  )
}
