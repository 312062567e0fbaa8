package graft

import graft.functions.{DotProduct, MinHashSig, SimHashVec, StringPolyHash, TokenCounts, UnitVector, WordNgrams}
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
}
