package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact-hash document dedup + sign-LSH ANN — the remaining two entries of
  * the training-pipeline dedup/similarity menu (exact hash-groupBy dedup;
  * LSH-bucketed ANN to complement the IVF variant).
  */
object Dedup2 {

  val queries: Map[String, Q] = Map(
    // exact dedup by content hash: one shuffle on md5(text); keep-min
    // doc_id; clusters with >1 copy. The corpus' planted near-dups are not
    // byte-identical, so exact copies (doc_id+1000000, same text for
    // doc_id % 10 = 0) are unioned in to exercise the operator.
    "dedup_exact_docs" -> { (s, dir) =>
      val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      base.unionByName(copies)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .where(col("n_copies") > 1)
        .select(col("keeper"), col("n_copies"), col("h"))
        .orderBy(col("keeper"), col("h"))
    },

    // sign-LSH ANN: 8 deterministic hyperplanes = the unit vectors of
    // vec_id 1..8; bucket = sign bits of the 8 dots; queries search only
    // their own bucket, then exact cosine rescoring top-3. Complements
    // sim_ann_ivf as the LSH-bucketed scale path.
    "sim_ann_lsh" -> { (s, dir) =>
      val all = Similarity.withUnit(Tables(s, dir, "embeddings"), col("embedding"))
        .select(col("vec_id"), col("v"))
      // The 8 hyperplanes pivot into ONE broadcast row of 8 array columns,
      // so the bucket bits are pure map-side expressions over `all` — no
      // 8× row inflation and no hash aggregation keyed on a 64-double
      // array (the r1/r2 plan grouped by (vec_id, v) after the explode).
      val pvCols = (1 to 8).map(p =>
        first(when(col("vec_id") === p, col("v")), ignoreNulls = true).as(s"pv$p"))
      val planeRow = all.where(col("vec_id").between(1, 8))
        .agg(pvCols.head, pvCols.tail: _*)
      val bucketExpr = (1 to 8).map(p =>
        shiftleft(when(round(Similarity.cosine(col("v"), col(s"pv$p")), 6) >= 0, 1L)
          .otherwise(0L), p - 1)).reduce(_ + _)
      val bucketed = all.crossJoin(broadcast(planeRow))
        .withColumn("bucket", bucketExpr)
        .select(col("vec_id"), col("v"), col("bucket"))
      val q = bucketed.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      q.join(bucketed, "bucket")
        .where(col("vec_id") =!= col("qid"))
        // + 0.0 normalizes IEEE -0.0 on a near-zero cosine (rank + emit)
        .withColumn("cos",
          round(Similarity.cosine(col("qv"), col("v")), 6) + lit(0.0))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rank"))
    }
  )

  // ONE unit-vector mirror for the package (Similarity.sqlUnit) — a
  // second hand-maintained copy could silently drift from the sim family
  private val sqlUnitVecs =
    s"SELECT vec_id, ${Similarity.sqlUnit("embedding")} AS v FROM embeddings"

  val oracle: Map[String, String] = Map(
    "dedup_exact_docs" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |k AS (SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
        |      FROM d GROUP BY 1)
        |SELECT keeper, n_copies, h FROM k WHERE n_copies > 1
        |ORDER BY keeper, h""".stripMargin,
    "sim_ann_lsh" ->
      s"""WITH e AS ($sqlUnitVecs),
         |planes AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id BETWEEN 1 AND 8),
         |bucketed AS (SELECT e.vec_id, e.v,
         |    cast(sum(CASE WHEN round(list_dot_product(e.v, p.pv), 6) >= 0
         |             THEN 1 ELSE 0 END << (p.pid - 1)) as bigint) AS bucket
         |  FROM e CROSS JOIN planes p GROUP BY e.vec_id, e.v),
         |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM bucketed WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.qid, b.vec_id,
         |    round(list_dot_product(q.qv, b.v), 6) + 0.0 AS cos
         |  FROM q JOIN bucketed b USING (bucket) WHERE b.vec_id <> q.qid),
         |ranked AS (SELECT qid, vec_id, cos,
         |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM scored)
         |SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= 3
         |ORDER BY qid, rank""".stripMargin
  )
}
