package graft

import graft.clean._
import org.apache.spark.sql.functions._

/** The Recipe export surface: `describe` (canonical serialization) must
  * round-trip through `Recipe.parse` to a structurally equal recipe —
  * which is what makes the exported session REPLAYABLE (the reference's
  * export-as-code feature), not just printable. */
class RecipeExportSpec extends SparkSuite {
  import TestSpark.spark.implicits._

  /** every op type once, with adversarial string params: commas,
    * brackets, quotes, backslashes, equals signs. */
  private val everyOp: Seq[CleanOp] = Seq(
    FillConstant("c1", "a,b [x] \"q\" \\ ="),
    FillConstant("c2", 42),
    FillConstant("c3", 42L),
    FillConstant("c4", 4.25),
    FillConstant("c5", true),
    FillMean("v"),
    FillMeanByGroup("v", Seq("g1", "g2")),
    FillMedian("v", 4),
    FillMode("et"),
    ForwardFill("v", Seq("ts", "id"), Seq("user")),
    BackwardFill("v", Seq("ts"), Seq("user", "region")),
    Interpolate("v", Seq("ts"), Seq("user"), 5),
    DropNaAny(Seq("a", "b")),
    DedupByKey(Seq("k"), Seq("o1", "o2")),
    ClipToQuantiles("v", 0.01, 0.99),
    Standardize("v", 4),
    SafeCastDouble("s", "double"),
    ParseTimestamp("t", "yyyy-MM-dd HH:mm:ss"),
    RecodeValues("et", Seq("a,b", "[x]", "\"q\""), Seq("A", "\\y", "=z")),
    SplitColumn("name", "^(.*)#([0-9]+)$", Seq("prefix", "num")),
    NormalizeWhitespace("name"),
    FingerprintCanonicalize("name"))

  test("describe round-trips through Recipe.parse for every op type") {
    val recipe = Recipe(everyOp)
    val parsed = Recipe.parse(recipe.describe)
    assert(parsed == recipe,
      s"round-trip mismatch:\n${recipe.describe}\nvs\n${parsed.describe}")
  }

  test("each op's describe round-trips alone (pinpoints a failing op)") {
    everyOp.foreach { op =>
      val parsed = Recipe.parse(op.describe)
      assert(parsed.ops == Seq(op), s"round-trip failed for: ${op.describe}")
    }
  }

  test("describe is one parseable line per op; exportCode is non-empty") {
    everyOp.foreach { op =>
      assert(!op.describe.contains("\n"), s"multi-line describe: ${op.describe}")
      assert(op.code.nonEmpty)
    }
  }

  test("a parsed recipe re-applies to the same result as the original") {
    val recipe = Recipe(Seq(
      FillMean("v"),
      ClipToQuantiles("v", 0.1, 0.9),
      DropNaAny(Seq("et")),
      DedupByKey(Seq("k"), Seq("v"))))
    val df = Seq(
      (1L, Some(10.0), Some("a")),
      (1L, Some(12.0), Some("a")),
      (2L, None, Some("b")),
      (3L, Some(100.0), None),
      (4L, Some(-50.0), Some("c")))
      .toDF("k", "v", "et")
    val a = recipe(df).orderBy("k").collect().toSeq
    val b = Recipe.parse(recipe.describe)(df).orderBy("k").collect().toSeq
    assert(a == b, "replayed recipe diverged from the original")
    assert(a.nonEmpty)
  }

  test("parse rejects unknown ops and malformed lines") {
    intercept[IllegalArgumentException](Recipe.parse("NotAnOp(column=\"x\")"))
    intercept[IllegalArgumentException](Recipe.parse("FillMean column v"))
  }

  test("describe FAILS FAST on unreplayable values (null, dates, non-string seqs)") {
    // silently stringifying these would make Recipe.parse return a
    // structurally different recipe — the export must throw instead
    intercept[IllegalArgumentException](FillConstant("c", null).describe)
    intercept[IllegalArgumentException](
      FillConstant("c", java.sql.Date.valueOf("2024-01-01")).describe)
    intercept[IllegalArgumentException](FillConstant("c", Seq(1, 2)).describe)
  }

  /** the exact strings the recipe_describe ORACLE pins as SQL literals
    * (RecipeQueries.oracle): a describe/code format change must fail HERE
    * (and at the oracle gate), not silently reformat both engines. */
  test("export format contract: pinned describe/code strings for the declared pipeline") {
    val expected = Seq(
      FillMean("v") ->
        ("""FillMean(column="v")""",
          """df.crossJoin(broadcast(df.agg(mean))).withColumn("v", coalesce(col("v"), mean))  // exact decimal mean"""),
      ClipToQuantiles("v", 0.01, 0.99) ->
        ("""ClipToQuantiles(column="v", pLo=0.01D, pHi=0.99D)""",
          """df.withColumn("v", least(greatest(col, p0.01), p0.99))"""),
      DropNaAny(Seq("et")) ->
        ("""DropNaAny(columns=["et"])""",
          """df.na.drop("any", Seq(et))"""),
      DedupByKey(Seq("event_id"), Seq("user_id", "v")) ->
        ("""DedupByKey(keys=["event_id"], order=["user_id","v"])""",
          """df.groupBy(event_id).agg(min(struct(user_id,v, *rest))).select(unpacked)  // keep-first by order"""))
    expected.foreach { case (op, (describe, code)) =>
      assert(op.describe == describe,
        s"describe format changed for ${op.productPrefix}:\n got ${op.describe}\nwant $describe")
      assert(op.code == code,
        s"code format changed for ${op.productPrefix}:\n got ${op.code}\nwant $code")
    }
  }

  test("undo drops exactly the last op and the export follows") {
    val r = Recipe(Seq(FillMean("v"), FillMode("et")))
    assert(r.undo == Recipe(Seq(FillMean("v"))))
    assert(r.undo.describe == FillMean("v").describe)
    assert(Recipe.parse(r.undo.describe) == r.undo)
  }
}
