package graft.plans

import graft.functions.JaroWinkler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, Greatest,
  GreaterThan, GreaterThanOrEqual, Least, Length, LessThan, LessThanOrEqual,
  Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (tier: custom `Rule[LogicalPlan]`, SURVEY §4): inject a
  * cheap LENGTH prefilter in front of Jaro-Winkler threshold predicates.
  *
  * Soundness bound: let l₁ ≤ l₂ be the string lengths. Matches m ≤ l₁ and
  * (m−t)/m ≤ 1 give jaro ≤ (2 + l₁/l₂)/3; the Winkler bonus (ℓ ≤ 4,
  * p = 0.1) gives jw ≤ 0.4 + 0.6·jaro = 0.8 + 0.2·(l₁/l₂). Hence
  * jw ≥ θ ⟹ l₁/l₂ ≥ 5θ − 4, a non-trivial bound for θ > 0.8. The rule
  * rewrites every conjunct `jaroWinkler(a,b) >= θ` (or `>`) with θ > 0.8
  * into `least(len) >= (5θ−4−ε)·greatest(len) AND <original>` — the
  * length arithmetic is O(1) per row and short-circuits the O(len²)
  * kernel for pairs the threshold could never accept (in a sorted-
  * neighborhood or blocked candidate stream, typically most of them).
  *
  * ε = 1e-9 keeps the prefilter SOUND under floating point: the bound is
  * attainable exactly (jw("abcd","abcdabcd") = 0.9 with ratio exactly
  * 1/2) and 5·0.9 − 4 rounds ABOVE 0.5 in binary, which would wrongly
  * exclude such boundary pairs without the slack.
  *
  * Fixed-point safe: predicates are compared semantically against the
  * conjuncts already present, so the second optimizer pass finds the
  * guard installed and changes nothing. Applied to Filter conditions AND
  * Join conditions (a JW threshold over two join sides lands in the join
  * residual, not a Filter). Installed via
  * `spark.experimental.extraOptimizations` ([[install]]) — no session
  * rebuild, idempotent.
  */
object JaroWinklerPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** constant threshold from any FOLDABLE double expression — a bare
    * Literal, but also e.g. `Cast(Literal(Decimal(0.9)), DoubleType)`
    * from a decimal literal in SQL text. */
  private def threshold(e: Expression): Option[Double] = e match {
    case Literal(t: Double, DoubleType) => Some(t)
    case _ if e.foldable && e.dataType == DoubleType =>
      Option(e.eval()).map(_.asInstanceOf[Double])
    case _ => None
  }

  /** matches jw ≥ θ in all four predicate spellings: jw >= θ, jw > θ,
    * θ <= jw, θ < jw (the commuted forms previously missed the
    * prefilter — a lost optimization, never a soundness issue). */
  private def guardFor(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(jw: JaroWinkler, t) =>
      threshold(t).filter(_ > 0.8).map(lenGuard(jw, _))
    case GreaterThan(jw: JaroWinkler, t) =>
      threshold(t).filter(_ > 0.8).map(lenGuard(jw, _))
    case LessThanOrEqual(t, jw: JaroWinkler) =>
      threshold(t).filter(_ > 0.8).map(lenGuard(jw, _))
    case LessThan(t, jw: JaroWinkler) =>
      threshold(t).filter(_ > 0.8).map(lenGuard(jw, _))
    case _ => None
  }

  private def lenGuard(jw: JaroWinkler, theta: Double): Expression = {
    val la = Length(jw.left)
    val lb = Length(jw.right)
    GreaterThanOrEqual(
      Cast(Least(Seq(la, lb)), DoubleType),
      org.apache.spark.sql.catalyst.expressions.Multiply(
        Literal(5.0 * theta - 4.0 - 1e-9),
        Cast(Greatest(Seq(la, lb)), DoubleType)))
  }

  private def augment(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(guardFor)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) None
    // guards FIRST: codegen evaluates And left-to-right, so the O(1)
    // length check short-circuits the O(len²) kernel
    else Some((guards ++ conjuncts).reduceLeft(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      augment(cond).map(Filter(_, child)).getOrElse(f)
    case j: Join if j.condition.isDefined =>
      augment(j.condition.get).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  /** Idempotently add this rule to the session's experimental optimizer
    * batch (runs inside the optimizer's fixed point — no session
    * rebuild). */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
