package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BloomBuild, BloomMightContain, DotProduct, JaroWinkler}

/** The Spark-native installation path for everything graft adds to
  * Catalyst — usable WITHOUT any graft code in the driver program:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions()(_))`.
  * Injects:
  *  - the [[JaroWinklerPrefilter]] optimizer rule (length prefilter in
  *    front of jw-threshold predicates — Filter AND Join residuals);
  *  - SQL functions `graft_jaro_winkler(a, b)`, `graft_dot(a, b)`,
  *    `graft_bloom_build(key, numBits, numHashes)`,
  *    `graft_bloom_might_contain(bloom, key)` — the codegen expressions
  *    behind the fuzzy-cluster, similarity, and decontamination
  *    families, exposed to plain SQL users.
  *
  * Everything injected here is also installable per-session at runtime
  * ([[JaroWinklerPrefilter.install]], `*Functions.register`) — this class
  * is the configuration-time form the preference order asks for, and the
  * one a shared cluster's spark-defaults can carry. Idempotent by
  * construction: injectFunction replaces, injectOptimizerRule dedups at
  * batch build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_], usage: String,
      build: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, null, name, usage, ""),
      build)

  /** Evaluate a required integer-literal argument at resolution time with a
    * named error instead of the opaque ClassCastException a column or
    * string argument would otherwise raise. */
  private def intLiteral(fnName: String, argName: String, e: Expression): Int = {
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"$fnName: $argName must be an integer literal, got non-foldable ${e.sql}"))
    e.eval() match {
      case n: java.lang.Number => n.intValue()
      case other =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" ->
            s"$fnName: $argName must be an integer literal, got ${Option(other).map(_.getClass.getSimpleName).getOrElse("NULL")}"))
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => JaroWinklerPrefilter)
    ext.injectFunction(fn("graft_jaro_winkler", classOf[JaroWinkler],
      "graft_jaro_winkler(a, b) - DuckDB-parity Jaro-Winkler similarity",
      exprs => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction(fn("graft_dot", classOf[DotProduct],
      "graft_dot(a, b) - ascending-index double dot product",
      exprs => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction(fn("graft_bloom_build", classOf[BloomBuild],
      "graft_bloom_build(key, numBits, numHashes) - bloom filter aggregate",
      exprs => BloomBuild(exprs(0),
        intLiteral("graft_bloom_build", "numBits", exprs(1)),
        intLiteral("graft_bloom_build", "numHashes", exprs(2)))))
    ext.injectFunction(fn("graft_bloom_might_contain", classOf[BloomMightContain],
      "graft_bloom_might_contain(bloom, key) - bloom membership probe",
      exprs => BloomMightContain(exprs(0), exprs(1))))
  }
}
