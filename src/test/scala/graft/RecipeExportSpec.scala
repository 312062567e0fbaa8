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

  test("undo drops exactly the last op and the export follows") {
    val r = Recipe(Seq(FillMean("v"), FillMode("et")))
    assert(r.undo == Recipe(Seq(FillMean("v"))))
    assert(r.undo.describe == FillMean("v").describe)
    assert(Recipe.parse(r.undo.describe) == r.undo)
  }
}
