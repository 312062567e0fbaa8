package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction as per-partition batch transforms.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (clearly marked below). Everything around it — the
  * binary column, the metadata struct schema, the mapPartitions batch
  * shape, the partition sizing — is the real 100 TB design: payloads stay
  * opaque bytes end-to-end, metadata travels in a narrow struct column so
  * filters on width/format prune without touching payload bytes, and the
  * decoder runs once per partition batch (the JVM analogue of a Pandas-UDF
  * `mapInPandas` batch loop).
  */
object Multimodal {

  /** Typed metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  val assetSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = false)))

  /** Build a binary "asset" table from documents (payload = utf-8 bytes —
    * stands in for image/audio blobs; schema and plumbing are the point). */
  def assets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("utf8").as("format"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("checksum")).as("meta"))

  /** ??? STUB: stands in for a real image/audio decoder (libs absent in
    * this container). Deterministic fake features: byte histogram moments.
    * Signature and batch shape are what a real decoder plugs into.
    * Empty payload → all-zero features (n_bytes 0, no fake count of 1). */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload.isEmpty) return Array(0f, 0f, 0f)
    var sum = 0L; var sq = 0L
    payload.foreach { b => val v = b & 0xff; sum += v; sq += v.toLong * v }
    val n = payload.length
    Array(n.toFloat, sum.toFloat / n, sq.toFloat / n)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Per-partition batch decode — one decoder instance per partition, rows
    * streamed through it (the Spark-native mapInPandas analogue). */
  def extractFeatures(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    df.select(col("doc_id"), col("content"))
      .mapPartitions { rows =>
        // real impl: initialize codec once here, then stream the batch
        rows.map { r =>
          Row(r.getLong(0), decodeStub(r.getAs[Array[Byte]](1)).toSeq)
        }
      }(enc)
  }

  /** Declared queries: metadata plumbing AND payload byte-ops are fully
    * oracle-checkable (length/md5/byte-slices are engine-independent; the
    * corpus is pure ASCII — verified byte length == char length — so the
    * DuckDB text mirror sees identical bytes). */
  val queries: Map[String, Q] = Map(
    "multimodal_meta" -> { (s, dir) =>
      assets(s, dir).select(
        col("doc_id"),
        col("meta.format").as("format"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.checksum").as("checksum"))
        .orderBy(col("doc_id"))
    },

    // FRAME SAMPLING on the binary payload — the video/audio access
    // pattern (fixed-size frame every stride), exact on bytes, no codec
    // needed: substring on BinaryType slices the payload, md5 fingerprints
    // each frame. The filter on (k·stride + len ≤ n_bytes) reads the
    // METADATA struct only — payload bytes are touched exclusively for
    // frames that exist. 64-byte frames every 128 bytes, ≤ 4 per asset.
    "multimodal_frame_sample" -> { (s, dir) =>
      assets(s, dir)
        .select(col("doc_id"), col("content"), col("meta.n_bytes").as("n"))
        .withColumn("k", explode(sequence(lit(0L), lit(3L))))
        .where(col("k") * 128L + 64L <= col("n"))
        .select(col("doc_id"), col("k"),
          md5(expr("substring(content, k * 128 + 1, 64)")).as("frame_md5"))
        .orderBy(col("doc_id"), col("k"))
    },

    // ASPECT BUCKETING + batch assignment — the image-training batcher:
    // assets group by (width × height) class and each bucket packs into
    // fixed-size batches of 8 (a training batch must be dimensionally
    // uniform; mixing aspect classes forces destructive square crops).
    // Dims derive deterministically from n_bytes — the clearly-marked
    // stand-in for the decoder's real dimensions (same contract as
    // decodeStub) — and the ONLY column read is the metadata struct:
    // payload bytes are never touched. Within-bucket positions ride the
    // distributed prefix sum keyed on the bucket (a window partitioned
    // by bucket would put one giant aspect class on one task at 100 TB).
    "multimodal_aspect_bucket" -> { (s, dir) =>
      val d = assets(s, dir)
        .select(col("doc_id"), col("meta.n_bytes").as("nb"))
        .select(col("doc_id"),
          concat(lit(256L) + (col("nb") % 5L) * 128L, lit("x"),
            lit(256L) + expr("(nb DIV 5) % 4") * 128L).as("bucket"))
        .withColumn("one", lit(1L))
      GraftOps.distributedRunningSum(d, "bucket", "doc_id", "one", "pos")
        .select(col("doc_id"), col("bucket"),
          expr("(pos - 1) DIV 8").as("batch_idx"))
        .orderBy("doc_id")
    },

    // FEATURE EXTRACTION through the per-partition batch-decode path
    // (extractFeatures → decodeStub): the one declared query that runs the
    // mapPartitions decoder kernel, so the oracle gate exercises the real
    // batch shape, not just the metadata plumbing. The stub's features are
    // deterministic byte-histogram moments; integer byte sums are exact in
    // both engines and the float32 divisions reproduce bit-for-bit (JVM
    // Float ÷ vs DuckDB REAL ÷), surfaced rounded to 3 decimals.
    "multimodal_feature_extract" -> { (s, dir) =>
      extractFeatures(assets(s, dir))
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("n_bytes"),
          round(element_at(col("features"), 2).cast("double"), 3).as("mean_r3"),
          round(element_at(col("features"), 3).cast("double"), 3).as("meansq_r3"))
        .where(col("n_bytes") > 0) // empty payloads: no row, same as the oracle
        .orderBy(col("doc_id"))
    },

    // RESIZE (downsample) on the payload — block-averaging, the shape a
    // real image/audio resize takes after decode, exact on bytes with no
    // codec: the first 128 payload bytes become 8 "pixels" of 16-byte
    // block means. Positions explode map-side, the per-(doc, block) sum
    // is one hash agg; integer sums are exact, the final /16.0 is the
    // same IEEE divide in both engines. Metadata-gated: only assets with
    // n_bytes ≥ 128 are touched.
    "multimodal_resize" -> { (s, dir) =>
      assets(s, dir)
        .select(col("doc_id"), col("content"), col("meta.n_bytes").as("n"))
        .where(col("n") >= 128L)
        .withColumn("pos", explode(sequence(lit(1L), lit(128L))))
        .select(col("doc_id"), expr("(pos - 1) div 16").as("block"),
          expr("ascii(cast(substring(content, cast(pos as int), 1) as string))")
            .cast("long").as("b"))
        .groupBy(col("doc_id"), col("block"))
        .agg((sum(col("b")) / 16.0).as("pixel"))
        .orderBy(col("doc_id"), col("block"))
    }
  )

  val oracle: Map[String, String] = Map(
    "multimodal_aspect_bucket" ->
      """WITH a AS (SELECT doc_id, cast(strlen(text) AS bigint) AS nb
        |           FROM documents),
        |d AS (SELECT doc_id,
        |    (256 + (nb % 5) * 128) || 'x' || (256 + ((nb // 5) % 4) * 128)
        |      AS bucket
        |  FROM a)
        |SELECT doc_id, bucket,
        |  cast((row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
        |    // 8 AS bigint) AS batch_idx
        |FROM d ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, 'utf8' AS format,
        |cast(strlen(text) as bigint) AS n_bytes,
        |md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id, k, md5(substring(text, cast(k * 128 + 1 as int), 64)) AS frame_md5
        |FROM documents CROSS JOIN range(4) r(k)
        |WHERE k * 128 + 64 <= strlen(text)
        |ORDER BY doc_id, k""".stripMargin,
    "multimodal_feature_extract" ->
      """WITH bytes AS (SELECT doc_id, strlen(text) AS n,
        |  list_transform(range(1, strlen(text)+1),
        |    i -> cast(ord(substring(text, cast(i as int), 1)) as bigint)) AS l
        |  FROM documents),
        |agg AS (SELECT doc_id, n,
        |  cast(list_sum(l) as bigint) AS s,
        |  cast(list_sum(list_transform(l, x -> x * x)) as bigint) AS q
        |  FROM bytes)
        |SELECT doc_id, n AS n_bytes,
        |  round(cast(cast(s AS REAL) / cast(n AS REAL) AS DOUBLE), 3) AS mean_r3,
        |  round(cast(cast(q AS REAL) / cast(n AS REAL) AS DOUBLE), 3) AS meansq_r3
        |FROM agg WHERE n > 0 ORDER BY doc_id""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id, (pos - 1) // 16 AS block,
        |sum(ord(substring(text, cast(pos as int), 1))) / 16.0 AS pixel
        |FROM documents CROSS JOIN range(1, 129) r(pos)
        |WHERE strlen(text) >= 128
        |GROUP BY doc_id, (pos - 1) // 16
        |ORDER BY doc_id, block""".stripMargin
  )
}
