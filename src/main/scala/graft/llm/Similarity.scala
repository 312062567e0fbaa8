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
  * (both engines), and cosine = dot / (sqrt(da)·sqrt(db)) is mirrored
  * shape-for-shape against DuckDB list_dot_product so the doubles agree
  * bit-for-bit before the final round(…, 6).
  *
  * Scale: `sim_cosine_pairs` blocks on `label`; `sim_knn_topk` is the
  * brute-force baseline kernel (per-partition top-k then merge);
  * `sim_ann_ivf` is the scale path — assign every vector to its nearest
  * centroid, probe only the best 2 clusters per query (REPOSE-style
  * reference-point partitioning, PAPERS.md).
  */
object Similarity {

  /** embeddings with double-cast vectors and precomputed self-dot. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("d2", aggregate(zip_with(col("v"), col("v"), _ * _),
        lit(0.0), _ + _))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** cos = dot/(sqrt(da)·sqrt(db)) — mirror this exact shape in SQL. */
  private def cosine(va: Column, vb: Column, da: Column, db: Column): Column =
    dot(va, vb) / (sqrt(da) * sqrt(db))

  private val sqlVecs =
    """SELECT vec_id, label, list_transform(embedding, x -> cast(x as double)) AS v,
      |list_dot_product(list_transform(embedding, x -> cast(x as double)),
      |                 list_transform(embedding, x -> cast(x as double))) AS d2
      |FROM embeddings""".stripMargin

  private val sqlCos =
    "list_dot_product(%s, %s) / (sqrt(%s) * sqrt(%s))"

  val queries: Map[String, Q] = Map(
    // exact cosine for all same-label pairs, top-100
    "sim_cosine_pairs" -> { (s, dir) =>
      val a = vecs(s, dir).select(col("label"), col("vec_id").as("id_a"),
        col("v").as("va"), col("d2").as("da"))
      val b = vecs(s, dir).select(col("label").as("lb"), col("vec_id").as("id_b"),
        col("v").as("vb"), col("d2").as("db"))
      a.join(b, col("label") === col("lb") && col("id_a") < col("id_b"))
        .select(col("label"), col("id_a"), col("id_b"),
          round(cosine(col("va"), col("vb"), col("da"), col("db")), 6).as("cos"))
        .orderBy(col("cos").desc, col("id_a"), col("id_b"))
        .limit(100)
    },

    // brute-force exact kNN: queries = vec_id % 50 = 0, k = 5
    "sim_knn_topk" -> { (s, dir) =>
      val q = vecs(s, dir).where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("d2").as("qd"))
      val c = vecs(s, dir)
        .select(col("vec_id"), col("v"), col("d2"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      q.crossJoin(c).where(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(cosine(col("qv"), col("v"), col("qd"), col("d2")), 6))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rank"))
    },

    // cosine-threshold dedup over vectors ∪ deterministic near-dup copies
    // (the base table has no cos ≥ 0.95 pairs — copies at vec_id+1000000
    // with a 1.01× scale exercise the operator end-to-end)
    "dedup_embedding_threshold" -> { (s, dir) =>
      val base = vecs(s, dir)
      val copies = Tables(s, dir, "embeddings")
        .where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double") * 1.01).as("v"))
        .withColumn("d2", aggregate(zip_with(col("v"), col("v"), _ * _),
          lit(0.0), _ + _))
      val all = base.unionByName(copies)
      val a = all.select(col("label"), col("vec_id").as("id_a"),
        col("v").as("va"), col("d2").as("da"))
      val b = all.select(col("label").as("lb"), col("vec_id").as("id_b"),
        col("v").as("vb"), col("d2").as("db"))
      a.join(b, col("label") === col("lb") && col("id_a") < col("id_b"))
        .withColumn("cos", round(cosine(col("va"), col("vb"), col("da"), col("db")), 6))
        .where(col("cos") >= 0.95)
        .select(col("id_a"), col("id_b"), col("cos"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // IVF-style ANN: centroids = vec_id % 97 = 0; every vector is assigned
    // to its nearest centroid; each query probes its 2 best clusters only.
    "sim_ann_ivf" -> { (s, dir) =>
      val all = vecs(s, dir)
      val cents = all.where(col("vec_id") % 97 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("d2").as("cd"))
      // nearest centroid per vector
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
      val assigned = all.crossJoin(broadcast(cents))
        .withColumn("ccos", round(cosine(col("v"), col("cv"), col("d2"), col("cd")), 6))
        .withColumn("arn", row_number().over(wAssign))
        .where(col("arn") === 1)
        .select(col("vec_id"), col("label"), col("v"), col("d2"), col("cid"))
      // 2 best centroids per query
      val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
      val probes = all.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("d2").as("qd"))
        .crossJoin(broadcast(cents))
        .withColumn("qcos", round(cosine(col("qv"), col("cv"), col("qd"), col("cd")), 6))
        .withColumn("prn", row_number().over(wProbe))
        .where(col("prn") <= 2)
        .select(col("qid"), col("qv"), col("qd"), col("cid"))
      // search only the probed clusters
      val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      probes.join(assigned, "cid")
        .where(col("vec_id") =!= col("qid"))
        .withColumn("cos", round(cosine(col("qv"), col("v"), col("qd"), col("d2")), 6))
        .withColumn("rank", row_number().over(wTop))
        .where(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rank"))
    }
  )

  private def cosSql(va: String, vb: String, da: String, db: String): String =
    sqlCos.format(va, vb, da, db)

  val oracle: Map[String, String] = Map(
    "sim_cosine_pairs" ->
      s"""WITH e AS ($sqlVecs)
         |SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.v", "b.v", "a.d2", "b.d2")}, 6) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |ORDER BY cos DESC, id_a, id_b LIMIT 100""".stripMargin,
    "sim_knn_topk" ->
      s"""WITH e AS ($sqlVecs),
         |q AS (SELECT vec_id AS qid, v AS qv, d2 AS qd FROM e WHERE vec_id % 50 = 0),
         |scored AS (SELECT qid, e.vec_id,
         |    round(${cosSql("qv", "e.v", "qd", "e.d2")}, 6) AS cos
         |  FROM q CROSS JOIN e WHERE e.vec_id <> qid),
         |ranked AS (SELECT qid, vec_id, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM scored)
         |SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,
    "dedup_embedding_threshold" ->
      s"""WITH base AS ($sqlVecs),
         |copies AS (SELECT vec_id + 1000000 AS vec_id, label,
         |    list_transform(embedding, x -> cast(x as double) * 1.01) AS v,
         |    list_dot_product(list_transform(embedding, x -> cast(x as double) * 1.01),
         |                     list_transform(embedding, x -> cast(x as double) * 1.01)) AS d2
         |  FROM embeddings WHERE vec_id % 10 = 0),
         |e AS (SELECT * FROM base UNION ALL SELECT * FROM copies)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.v", "b.v", "a.d2", "b.d2")}, 6) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(${cosSql("a.v", "b.v", "a.d2", "b.d2")}, 6) >= 0.95
         |ORDER BY id_a, id_b""".stripMargin,
    "sim_ann_ivf" ->
      s"""WITH e AS ($sqlVecs),
         |cents AS (SELECT vec_id AS cid, v AS cv, d2 AS cd FROM e WHERE vec_id % 97 = 0),
         |assigned AS (SELECT vec_id, label, v, d2, cid FROM (
         |  SELECT e.vec_id, e.label, e.v, e.d2, c.cid,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY round(${cosSql("e.v", "c.cv", "e.d2", "c.cd")}, 6) DESC, c.cid) AS arn
         |  FROM e CROSS JOIN cents c) WHERE arn = 1),
         |probes AS (SELECT qid, qv, qd, cid FROM (
         |  SELECT q.vec_id AS qid, q.v AS qv, q.d2 AS qd, c.cid,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${cosSql("q.v", "c.cv", "q.d2", "c.cd")}, 6) DESC, c.cid) AS prn
         |  FROM e q CROSS JOIN cents c WHERE q.vec_id % 50 = 0) WHERE prn <= 2),
         |scored AS (SELECT p.qid, a.vec_id,
         |    round(${cosSql("p.qv", "a.v", "p.qd", "a.d2")}, 6) AS cos
         |  FROM probes p JOIN assigned a USING (cid) WHERE a.vec_id <> p.qid),
         |ranked AS (SELECT qid, vec_id, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM scored)
         |SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin
  )
}
