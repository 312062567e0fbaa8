package graft

import graft.functions.{DotProduct, Int8Dot, MinHashSig, PackInt8, SimHashVec, StringPolyHash, TokenCounts, UnitVector, WordNgrams}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/** The native expressions must be bit-identical to the composable
  * higher-order-function forms they replace (the DuckDB oracles mirror the
  * HOF shapes, so equivalence here is what keeps the oracles valid). */
class ExpressionsSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  test("DotProduct equals the zip_with/aggregate fold bit-for-bit") {
    val df = Tables(spark, sf, "embeddings")
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("hof", aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _))
      .withColumn("native", ColumnBridge.column(
        DotProduct(ColumnBridge.expression(col("v")), ColumnBridge.expression(col("v")))))
    assert(df.where(col("hof") =!= col("native")).count() == 0)
  }

  test("DotProduct survives whole-stage codegen") {
    val df = Tables(spark, sf, "embeddings")
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
      .withColumn("d", ColumnBridge.column(
        DotProduct(ColumnBridge.expression(col("v")), ColumnBridge.expression(col("v")))))
    assert(df.agg(sum("d")).head().getDouble(0) > 0.0)
  }

  test("Int8Dot over PackInt8 payloads equals the double dot over q bit-for-bit") {
    // the real quantization pipeline on the embeddings table: q is the
    // integer-valued-double vector the declared ANN queries rank with;
    // q8 is its packed int8 form — the byte dot must reproduce the
    // double dot EXACTLY on every self-pair (packing is an exact
    // narrowing, |dot| ≤ 127²·64 ≪ 2⁵³ so the double holds it exactly)
    val q = GraftOps.withInt8PackedQuantization(
      llm.Similarity.withUnit(
        Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding")),
        col("embedding")))
    val df = q
      .withColumn("dd", ColumnBridge.column(DotProduct(
        ColumnBridge.expression(col("q")), ColumnBridge.expression(col("q")))))
      .withColumn("bd", ColumnBridge.column(Int8Dot(
        ColumnBridge.expression(col("q8")), ColumnBridge.expression(col("q8")))))
    assert(df.where(col("bd").cast("double") =!= col("dd")).count() == 0)
    assert(df.agg(sum("bd")).head().getLong(0) > 0L) // codegen path exercised
  }

  test("PackInt8 refuses fractional / out-of-range / null-element vectors") {
    val rows = Seq(
      (1L, Seq(1.0, -127.0)),   // valid
      (2L, Seq(0.5, 1.0)),      // fractional → null (no silent truncation)
      (3L, Seq(128.0, 0.0))     // out of int8 range → null (no wrap)
    ).toDF("id", "q")
    val packed = rows.withColumn("q8",
        ColumnBridge.column(PackInt8(ColumnBridge.expression(col("q")))))
      .select("id", "q8").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(packed(1L) != null &&
      packed(1L).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, -127))
    assert(packed(2L) == null && packed(3L) == null)
    val nullElem = Seq((4L, Seq(Some(1.0), None))).toDF("id", "q")
      .withColumn("q8", ColumnBridge.column(PackInt8(ColumnBridge.expression(col("q")))))
      .select("q8").head()
    assert(nullElem.isNullAt(0), "null element must null the payload")
  }

  test("Int8Dot nulls mismatched lengths like DotProduct") {
    val df = Seq((Array[Byte](1, 2), Array[Byte](3))).toDF("a", "b")
      .withColumn("d", ColumnBridge.column(Int8Dot(
        ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")))))
    assert(df.select("d").head().isNullAt(0))
  }

  test("WordNgrams(n=2,3) equals the transform/element_at form on long docs") {
    // NOTE: the HOF form itself is only valid for size >= n (sequence(1,0)
    // yields a DESCENDING [1,0], not empty — a latent bug the native
    // expression fixes by returning an empty array).
    val df = Seq("a b c d e", "p q r").toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val hofTri = transform(sequence(lit(1), size(col("toks")) - 2),
      i => concat_ws(" ", element_at(col("toks"), i),
        element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))
    val out = df
      .withColumn("tri", ColumnBridge.column(WordNgrams(ColumnBridge.expression(col("toks")), 3)))
      .withColumn("hof3", hofTri)
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](r.fieldIndex("tri")) == r.getSeq[String](r.fieldIndex("hof3")))
    }
  }

  test("UnitVector equals the transform/aggregate/zip_with chain bit-for-bit") {
    val df = Tables(spark, sf, "embeddings")
      .withColumn("__v0", transform(col("embedding"), x => x.cast("double")))
      .withColumn("__d2", aggregate(zip_with(col("__v0"), col("__v0"), _ * _),
        lit(0.0), _ + _))
      .withColumn("hof", transform(col("__v0"), x => x / sqrt(col("__d2"))))
      .withColumn("native", ColumnBridge.column(
        UnitVector(ColumnBridge.expression(col("embedding")))))
    assert(df.where(not(col("hof") <=> col("native"))).count() == 0)
    // double input path (the scaled-copies case)
    val scaled = Tables(spark, sf, "embeddings")
      .withColumn("raw", transform(col("embedding"), x => x.cast("double") * 1.01))
      .withColumn("__d2", aggregate(zip_with(col("raw"), col("raw"), _ * _),
        lit(0.0), _ + _))
      .withColumn("hof", transform(col("raw"), x => x / sqrt(col("__d2"))))
      .withColumn("native", ColumnBridge.column(
        UnitVector(ColumnBridge.expression(col("raw")))))
    assert(scaled.where(not(col("hof") <=> col("native"))).count() == 0)
  }

  test("UnitVector nulls the whole vector on a null element (no fabricated values)") {
    val df = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0)),
      (2L, Seq[java.lang.Double](3.0, 4.0))).toDF("id", "raw")
      .withColumn("v", ColumnBridge.column(
        UnitVector(ColumnBridge.expression(col("raw")))))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(2))
    assert(rows(1).getSeq[Double](2) == Seq(0.6, 0.8))
  }

  test("MinHashSig/SimHashVec/TokenCounts skip null elements like the exploded form") {
    val df = Seq((1L, Seq[String]("a b c", null, "a b c"))).toDF("id", "sh")
    val clean = Seq((1L, Seq[String]("a b c", "a b c"))).toDF("id", "sh")
    def sig(d: org.apache.spark.sql.DataFrame) = d.select(
      ColumnBridge.column(MinHashSig(ColumnBridge.expression(col("sh")))).as("m"),
      ColumnBridge.column(SimHashVec(ColumnBridge.expression(col("sh")))).as("s"),
      ColumnBridge.column(TokenCounts(ColumnBridge.expression(col("sh")))).as("t"))
    assert(sig(df).collect().toSeq == sig(clean).collect().toSeq)
    // all-null array → null signatures (doc drops out), not a crash
    val allNull = Seq((1L, Seq[String](null))).toDF("id", "sh")
    val r = sig(allNull).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("StringPolyHash equals the explicit fold, survives codegen") {
    val p = 2147483647L
    def ref(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c) % p)
    val rows = Seq("abc", "the quick brown", "lorem ipsum dolor", "x", "")
      .toDF("s")
      .withColumn("h", ColumnBridge.column(StringPolyHash(ColumnBridge.expression(col("s")))))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == ref(r.getString(0)), r.getString(0)))
  }

  test("MinHashSig equals the exploded min-over-hashes formulation") {
    val p = lit(2147483647L)
    val da = llm.Dedup.shingleArrays(
      Tables(spark, sf, "documents").limit(200), "doc_id", "text")
    val native = da
      .withColumn("mhs", ColumnBridge.column(MinHashSig(ColumnBridge.expression(col("sh")))))
      .where(col("mhs").isNotNull)
      .select(col("doc_id") +: (0 until 16).map(i =>
        element_at(col("mhs"), i + 1).as(s"mh$i")): _*)
    val exploded = da.select(col("doc_id"), explode(col("sh")).as("bg"))
      .withColumn("tid", llm.Dedup.shingleId(col("bg")))
      .groupBy("doc_id")
      .agg((0 until 16).map(i =>
        min(pmod(col("tid") * (2 * i + 3) + (5 * i + 7), p)).as(s"mh$i")).head,
        (1 until 16).map(i =>
          min(pmod(col("tid") * (2 * i + 3) + (5 * i + 7), p)).as(s"mh$i")): _*)
    assert(native.exceptAll(exploded).count() == 0)
    assert(exploded.exceptAll(native).count() == 0)
  }

  test("SimHashVec equals the exploded tf-weighted component sums") {
    val p = lit(2147483647L)
    val da = llm.Dedup.shingleArrays(
      Tables(spark, sf, "documents").limit(200), "doc_id", "text")
    val native = da
      .withColumn("vv", ColumnBridge.column(SimHashVec(ColumnBridge.expression(col("sh")))))
      .where(col("vv").isNotNull)
      .select(col("doc_id") +: (0 until 32).map(j =>
        element_at(col("vv"), j + 1).as(s"v$j")): _*)
    val exploded = da.select(col("doc_id"), explode(col("sh")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
      .withColumn("thash", pmod(llm.Dedup.shingleId(col("bg")) * 737 + 97, p))
      .groupBy("doc_id")
      .agg((0 until 32).map(j =>
        sum(col("tf") * (expr(s"shiftright(thash, $j) & 1") * 2 - 1)).as(s"v$j")).head,
        (1 until 32).map(j =>
          sum(col("tf") * (expr(s"shiftright(thash, $j) & 1") * 2 - 1)).as(s"v$j")): _*)
    assert(native.exceptAll(exploded).count() == 0)
    assert(exploded.exceptAll(native).count() == 0)
  }

  test("TokenCounts equals explode + groupBy(doc, word) counts") {
    val da = Tables(spark, sf, "documents").limit(200)
      .withColumn("toks", split(lower(col("text")), " "))
    val native = da.select(col("doc_id"), explode(ColumnBridge.column(
      TokenCounts(ColumnBridge.expression(col("toks"))))).as("wc"))
      .select(col("doc_id"), col("wc.word").as("word"), col("wc.cnt").as("cnt"))
    val exploded = da.select(col("doc_id"), explode(col("toks")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
    assert(native.exceptAll(exploded).count() == 0)
    assert(exploded.exceptAll(native).count() == 0)
  }

  test("CharNgrams equals the transform/substring HOF form, incl. multi-byte") {
    val df = Seq("spark analytics", "abc", "ab", "", "héllo wörld")
      .toDF("text")
    val hof = expr(
      "transform(sequence(1, greatest(char_length(text) - 2, 1)), " +
        "i -> substring(text, i, 3))")
    val out = df
      .withColumn("native", ColumnBridge.column(graft.functions.CharNgrams(
        ColumnBridge.expression(col("text")), 3)))
      .withColumn("hof", when(length(col("text")) >= 3, hof)
        .otherwise(expr("array()")))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](r.fieldIndex("native")) ==
        r.getSeq[String](r.fieldIndex("hof")), s"for '${r.getString(0)}'")
    }
  }

  test("CharNgrams survives whole-stage codegen") {
    val df = Tables(spark, sf, "documents")
      .withColumn("g", ColumnBridge.column(graft.functions.CharNgrams(
        ColumnBridge.expression(col("text")), 3)))
      .select(sum(size(col("g"))).as("n"))
    val expected = Tables(spark, sf, "documents")
      .select(sum(greatest(length(col("text")) - 2, lit(0)))).head().getLong(0)
    // collect() drives THIS dataset's QueryExecution (head() would build
    // a separate limit-1 execution and leave df's AQE plan unfinalized)
    assert(df.collect()(0).getLong(0) == expected)
    // the AQE final plan only materializes after execution (round-6
    // lesson), and the final-plan rendering marks codegen stages with
    // "*(n)" rather than the literal WholeStageCodegen node name — the
    // charngrams Project must carry the marker (i.e. not fall back to
    // an interpreted span)
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[charngrams""".r.findFirstIn(plan).isDefined,
      plan.take(600))
  }

  test("WordNgrams returns empty (not an error) when the doc is shorter than n") {
    val out = Seq("x y", "solo").toDF("text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("tri", ColumnBridge.column(WordNgrams(ColumnBridge.expression(col("toks")), 3)))
      .withColumn("bi", ColumnBridge.column(WordNgrams(ColumnBridge.expression(col("toks")), 2)))
      .collect()
    val xy = out.find(_.getString(0) == "x y").get
    assert(xy.getSeq[String](xy.fieldIndex("tri")).isEmpty)
    assert(xy.getSeq[String](xy.fieldIndex("bi")) == Seq("x y"))
    val solo = out.find(_.getString(0) == "solo").get
    assert(solo.getSeq[String](solo.fieldIndex("bi")).isEmpty)
  }

  test("SparseQDot equals the join-back floor-quantized term sum bit-for-bit") {
    // r14: the tfidf exact-verify kernel — merge-intersect over sorted
    // (word, wn) vectors must reproduce the old postings-join shape's
    // sum(floor(wa*wb*1e12)) exactly, including boundary products, on
    // every candidate doc pair of the real corpus
    val tf = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .withColumn("wn", col("cnt").cast("double") / 10.0)
    val docs = tf.select("doc_id").distinct().limit(40)
    val pairs = docs.select(col("doc_id").as("doc_a"))
      .crossJoin(docs.select(col("doc_id").as("doc_b")))
      .where(col("doc_a") < col("doc_b")).limit(300)
    val joinForm = pairs
      .join(tf.select(col("doc_id").as("doc_a"), col("word"), col("wn").as("wa")), "doc_a")
      .join(tf.select(col("doc_id").as("doc_b"), col("word"), col("wn").as("wb")),
        Seq("doc_b", "word"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(floor(col("wa") * col("wb") * 1e12).cast("long")).as("q_join"))
    val vecs = tf.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("word"), col("wn")))).as("vec"))
    val native = pairs
      .join(vecs.select(col("doc_id").as("doc_a"), col("vec").as("va")), "doc_a")
      .join(vecs.select(col("doc_id").as("doc_b"), col("vec").as("vb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), ColumnBridge.column(
        graft.functions.SparseQDot(ColumnBridge.expression(col("va")),
          ColumnBridge.expression(col("vb")))).as("q_native"))
    val joined = native.join(joinForm, Seq("doc_a", "doc_b"), "left")
    // pairs sharing no word: join form emits no row, kernel must emit 0
    assert(joined.where(col("q_join").isNotNull &&
      col("q_join") =!= col("q_native")).count() == 0)
    assert(joined.where(col("q_join").isNull &&
      col("q_native") =!= 0L).count() == 0)
    assert(native.count() > 0)
  }
}
