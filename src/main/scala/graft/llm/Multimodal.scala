package graft.llm

import graft._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode/feature-extraction as per-partition batch transforms.
  *
  * The decode kernel is a REAL pure-JVM image decoder: binary P6 PPM
  * (netpbm) — ASCII header parse (magic, dims, maxval, comments) + raw
  * RGB raster — no external codec library needed. The payloads
  * [[ppmAssets]] builds are genuine PPM files any netpbm tool would
  * open. The rest is the 100 TB design: payloads stay opaque bytes
  * end-to-end, metadata travels in a narrow struct column so filters on
  * width/format prune without touching payload bytes, and the decoder
  * runs once per partition batch (the JVM analogue of a Pandas-UDF
  * `mapInPandas` batch loop). Formats with entropy coding (JPEG/PNG)
  * plug into the same extractFeatures signature.
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

  /** REAL pure-JVM image decode: binary P6 PPM (netpbm). Parses the
    * ASCII header — magic "P6", whitespace/comment-separated width,
    * height, maxval, one whitespace byte — then consumes exactly
    * width·height·3 raw channel bytes. Features are decoded-pixel
    * statistics: [width, height, n_channel_bytes, mean, mean-square],
    * all integer byte math until the two float divisions (bit-equal to
    * DuckDB REAL division — the established float32 parity rule).
    * Malformed payloads throw IllegalArgumentException: a corrupt image
    * in a curation pipeline must surface, not silently zero-fill. */
  def decodePpm(payload: Array[Byte]): Array[Float] = {
    var i = 0
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def token(): String = {
      // netpbm allows '#'-to-end-of-line comments between header tokens
      var skipping = true
      while (skipping && i < payload.length) {
        if (isWs(payload(i))) i += 1
        else if (payload(i) == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
        } else skipping = false
      }
      val start = i
      while (i < payload.length && !isWs(payload(i))) i += 1
      require(i > start, "PPM: truncated header")
      new String(payload, start, i - start, "US-ASCII")
    }
    require(token() == "P6", "PPM: bad magic (want P6)")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(w > 0 && h > 0, s"PPM: bad dimensions ${w}x$h")
    require(maxval == 255, s"PPM: unsupported maxval $maxval (want 8-bit)")
    i += 1 // exactly ONE whitespace byte separates maxval from raster data
    // raster size in Long: adversarial headers (w=1431655766,h=1) overflow
    // Int to a small positive n and would pass the truncation check
    val nL = w.toLong * h * 3L
    require(nL > 0 && nL <= payload.length.toLong - i,
      s"PPM: truncated raster (want $nL bytes, have ${payload.length - i})")
    val n = nL.toInt
    var sum = 0L; var sq = 0L
    var j = i
    while (j < i + n) {
      val v = payload(j) & 0xff; sum += v; sq += v.toLong * v; j += 1
    }
    Array(w.toFloat, h.toFloat, n.toFloat, sum.toFloat / n, sq.toFloat / n)
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
        // decoder state (buffers, codec tables) would initialize once per
        // partition here, then the batch streams through it
        rows.map { r =>
          Row(r.getLong(0), decodePpm(r.getAs[Array[Byte]](1)).toSeq)
        }
      }(enc)
  }

  /** Binary P6 PPM assets: a REAL image file per document — ASCII header
    * + raw RGB raster — with dimensions derived from the text length
    * (4+len%5 × 3+(len/5)%4, the aspect_bucket rule) and channel bytes
    * taken from the text (right-padded with 'x' to the 144-byte max
    * raster). The decoder does NOT know this construction: it parses
    * whatever header it finds and reads w·h·3 raster bytes — which is
    * what lets the DuckDB oracle (which mirrors the construction, not
    * the decoder) gate the decode end-to-end. */
  def ppmAssets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        (lit(4L) + octet_length(col("text")) % 5L).as("w"),
        (lit(3L) + expr("(octet_length(text) DIV 5) % 4")).as("h"),
        col("text"))
      .select(col("doc_id"),
        concat(
          encode(format_string("P6\n%d %d\n255\n", col("w"), col("h")), "UTF-8"),
          encode(expr("substring(rpad(text, 144, 'x'), 1, cast(w * h * 3 as int))"),
            "UTF-8")).as("content"))
      .select(col("doc_id"), col("content"),
        struct(
          lit("ppm").as("format"),
          octet_length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("checksum")).as("meta"))

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
    // Dims derive deterministically from n_bytes — the same w×h rule
    // ppmAssets encodes into its PPM headers — and the ONLY column read
    // is the metadata struct:
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
    // (extractFeatures → decodePpm): the payloads are REAL binary P6 PPM
    // images ([[ppmAssets]]) and the decoder REALLY parses them — header
    // scan for magic/width/height/maxval, then exactly w·h·3 raster
    // bytes. width/height in the output come FROM THE PARSED HEADER;
    // the oracle mirrors the image construction (not the decoder), so a
    // decode bug — off-by-one raster offset, mis-parsed dims — breaks
    // the hash. Integer byte sums are exact in both engines and the
    // float32 divisions reproduce bit-for-bit (JVM Float ÷ vs DuckDB
    // REAL ÷), surfaced rounded to 3 decimals.
    "multimodal_feature_extract" -> { (s, dir) =>
      extractFeatures(ppmAssets(s, dir))
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("width"),
          element_at(col("features"), 2).cast("long").as("height"),
          element_at(col("features"), 3).cast("long").as("n_channel_bytes"),
          round(element_at(col("features"), 4).cast("double"), 3).as("mean_r3"),
          round(element_at(col("features"), 5).cast("double"), 3).as("meansq_r3"))
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
      """WITH dims AS (SELECT doc_id,
        |    4 + strlen(text) % 5 AS w, 3 + (strlen(text) // 5) % 4 AS h,
        |    text FROM documents),
        |px AS (SELECT doc_id, w, h, w * h * 3 AS n,
        |  list_transform(range(1, cast(w * h * 3 AS int) + 1),
        |    i -> cast(ord(substring(rpad(text, 144, 'x'), cast(i as int), 1))
        |      as bigint)) AS l
        |  FROM dims),
        |agg AS (SELECT doc_id, w, h, n,
        |  cast(list_sum(l) as bigint) AS s,
        |  cast(list_sum(list_transform(l, x -> x * x)) as bigint) AS q
        |  FROM px)
        |SELECT doc_id, cast(w AS bigint) AS width, cast(h AS bigint) AS height,
        |  cast(n AS bigint) AS n_channel_bytes,
        |  round(cast(cast(s AS REAL) / cast(n AS REAL) AS DOUBLE), 3) AS mean_r3,
        |  round(cast(cast(q AS REAL) / cast(n AS REAL) AS DOUBLE), 3) AS meansq_r3
        |FROM agg ORDER BY doc_id""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id, (pos - 1) // 16 AS block,
        |sum(ord(substring(text, cast(pos as int), 1))) / 16.0 AS pixel
        |FROM documents CROSS JOIN range(1, 129) r(pos)
        |WHERE strlen(text) >= 128
        |GROUP BY doc_id, (pos - 1) // 16
        |ORDER BY doc_id, block""".stripMargin
  )
}
