package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.clean._

/** Round-12 session-replay property (VERDICT r11 item 7): for RANDOM
  * recipes over every CleanOp case class — with adversarial string
  * params (quotes, backslashes, newlines, control chars, unicode) —
  * `Recipe.parse(recipe.describe)` must be STRUCTURALLY EQUAL to the
  * original, and replaying the parsed recipe on the same input must
  * produce a PLAN-IDENTICAL DataFrame (Catalyst `sameResult` on the
  * analyzed plans — the reference's session-replay semantics: an
  * exported session re-runs as the same computation, not merely one
  * that happens to agree on today's rows). */
object Round12Props extends Properties("RecipeRoundTrip") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private lazy val spark = TestSpark.spark

  // adversarial-but-legal op strings: every structural character the
  // describe grammar uses, plus control chars and non-ASCII
  private val nastyChar: Gen[Char] = Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('"', '\\', ',', '[', ']', '=', '(', ')',
      ' ', '\n', '\r', '\t', '', 'é', 'π', '日'))
  private val nastyString: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, nastyChar)).map(_.mkString)
  private val colName: Gen[String] = Gen.oneOf("v", "et", "name", "s", "t")
  private val strCols: Gen[Seq[String]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, colName)).map(_.distinct)

  // structural generator: any field values, for the parse==describe law
  private val anyOp: Gen[CleanOp] = Gen.oneOf(
    Gen.zip(nastyString, Gen.oneOf[Any](
      nastyString.sample.getOrElse("x"), Gen.const(42).sample.get,
      7L, 4.25, -0.0, 1.0e-7, true, false))
      .map { case (c, v) => FillConstant(c, v) },
    nastyString.map(FillMean(_)),
    Gen.zip(nastyString, strCols).map { case (c, g) => FillMeanByGroup(c, g) },
    Gen.zip(nastyString, Gen.chooseNum(0, 9)).map { case (c, r) => FillMedian(c, r) },
    nastyString.map(FillMode(_)),
    Gen.zip(nastyString, strCols, strCols)
      .map { case (c, o, p) => ForwardFill(c, o, p) },
    Gen.zip(nastyString, strCols, strCols)
      .map { case (c, o, p) => BackwardFill(c, o, p) },
    Gen.zip(nastyString, strCols, strCols, Gen.chooseNum(0, 9))
      .map { case (c, o, p, r) => Interpolate(c, o, p, r) },
    strCols.map(DropNaAny(_)),
    Gen.zip(strCols, strCols).map { case (k, o) => DedupByKey(k, o) },
    Gen.zip(nastyString, Gen.chooseNum(0.0, 0.4), Gen.chooseNum(0.6, 1.0))
      .map { case (c, lo, hi) => ClipToQuantiles(c, lo, hi) },
    Gen.zip(nastyString, Gen.oneOf("double", "int", "long"))
      .map { case (c, t) => SafeCastDouble(c, t) },
    Gen.zip(nastyString, nastyString).map { case (c, f) => ParseTimestamp(c, f) },
    Gen.zip(nastyString, Gen.chooseNum(0, 9)).map { case (c, r) => Standardize(c, r) },
    Gen.zip(nastyString, nastyString, Gen.listOfN(2, nastyString))
      .map { case (c, f, t) =>
        // constructor requires distinct source values
        RecodeValues(c, Seq(f + "1", f + "2"), t) },
    Gen.zip(nastyString, nastyString, strCols)
      .map { case (c, p, into) => SplitColumn(c, p, into) },
    nastyString.map(NormalizeWhitespace(_)),
    nastyString.map(FingerprintCanonicalize(_)))

  property("parse(describe) is structurally equal for ANY op values") =
    Prop.forAll(Gen.chooseNum(0, 8).flatMap(Gen.listOfN(_, anyOp))) { ops =>
      val r = Recipe(ops)
      val parsed = Recipe.parse(r.describe)
      if (parsed != r)
        println(s"ROUND-TRIP MISMATCH:\n${r.describe}\nvs\n${parsed.describe}")
      parsed == r
    }

  // applicable generator: ops bound to the fixture's real columns, for
  // the plan-identical replay law
  private val applicableOp: Gen[CleanOp] = Gen.oneOf(
    Gen.oneOf(Gen.chooseNum(-5.0, 5.0).map(FillConstant("v", _)),
      nastyString.map(FillConstant("et", _))),
    Gen.const(FillMean("v")),
    Gen.const(FillMeanByGroup("v", Seq("et"))),
    Gen.chooseNum(1, 8).map(FillMedian("v", _)),
    Gen.const(FillMode("et")),
    Gen.const(ForwardFill("v", Seq("ts", "k"), Seq("et"))),
    Gen.const(BackwardFill("v", Seq("ts", "k"), Seq("et"))),
    Gen.chooseNum(1, 8).map(Interpolate("v", Seq("ts"), Seq("et"), _)),
    Gen.someOf(Seq("v", "et", "name")).suchThat(_.nonEmpty)
      .map(cs => DropNaAny(cs.toSeq)),
    Gen.const(DedupByKey(Seq("k"), Seq("ts", "v"))),
    Gen.zip(Gen.chooseNum(0.01, 0.3), Gen.chooseNum(0.7, 0.99))
      .map { case (lo, hi) => ClipToQuantiles("v", lo, hi) },
    Gen.const(SafeCastDouble("s")),
    Gen.const(ParseTimestamp("t")),
    Gen.chooseNum(1, 8).map(Standardize("v", _)),
    Gen.zip(nastyString, nastyString)
      .map { case (a, b) => RecodeValues("et", Seq("x", a), Seq(b, "y")) },
    Gen.const(SplitColumn("name", "^(.*)#([0-9]+)$", Seq("pre", "num"))),
    Gen.const(NormalizeWhitespace("name")),
    Gen.const(FingerprintCanonicalize("name")))

  property("replaying the parsed recipe is PLAN-IDENTICAL (sameResult)") = {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0), Some("x"), "Ann#1", "12.5", "2024-01-01 00:00:00", 100L),
      (2L, None, Some("y"), "Bob#2", "bad", "2024-01-02 00:00:00", 200L),
      (3L, Some(-5.0), None, " ann #1 ", "7", "2024-01-03 00:00:00", 300L))
      .toDF("k", "v", "et", "name", "s", "t", "ts")
    Prop.forAll(Gen.chooseNum(1, 5).flatMap(Gen.listOfN(_, applicableOp))) { ops =>
      // SplitColumn/SafeCast change the schema; dedupe op targets so a
      // recipe stays applicable regardless of order
      val r = Recipe(ops.distinctBy(_.productPrefix))
      val replayed = Recipe.parse(r.describe)
      val a = r(df).queryExecution.analyzed
      val b = replayed(df).queryExecution.analyzed
      if (!a.sameResult(b))
        println(s"PLAN DIVERGENCE for:\n${r.describe}")
      a.sameResult(b)
    }
  }
}
