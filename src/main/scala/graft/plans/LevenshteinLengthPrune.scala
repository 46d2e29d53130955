package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Abs, And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, Length,
  LessThan, LessThanOrEqual, Levenshtein, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Injected optimizer rule (SURVEY.md §4.3 extension point, registered
  * via [[graft.GraftExtensions]]): every `levenshtein(a, b) <= k`
  * predicate implies `abs(length(a) - length(b)) <= k` — the DP can
  * never return less than the length difference — so the rule ANDs
  * the implied guard into the Filter. The guard is a two-`length`
  * integer compare that whole-stage codegen evaluates first (Spark
  * emits conjuncts in order), short-circuiting the O(k·len) DP on
  * every length-incompatible row; d8-style selectivity measurements on
  * the d29 corpus show >90 % of prefix candidates die on length alone.
  * Operators that remember the guard by hand (d29) are untouched —
  * injection dedupes against semantically-equal existing conjuncts,
  * which also makes the rule idempotent under the fixed-point batch.
  *
  * Soundness at the null/edge boundaries: if either side is null the
  * original levenshtein conjunct is null and the Filter already drops
  * the row — the guard being null too changes nothing (AND(null, null)
  * = null). If the original conjunct is true, both lengths exist and
  * the triangle bound makes the guard true. Non-deterministic inputs
  * are skipped (the guard would re-evaluate them); matching is
  * post-analysis, so only the exactly-typed literal forms rewrite —
  * a Cast-wrapped compare stays untouched rather than risking a
  * mistyped tree.
  *
  * Covered forms (all with non-null INT literals):
  *  - `levenshtein(a, b) <= k` and `< k`
  *  - `levenshtein(a, b, k) >= 0` (the threshold form's accept test —
  *    it returns -1 above the threshold)
  */
object LevenshteinLengthPrune extends Rule[LogicalPlan] with PredicateHelper {

  private def intLit(e: Expression): Boolean = e match {
    case Literal(v, IntegerType) => v != null
    case _ => false
  }

  // skip when BOTH sides fold (the guard would be a constant — useless)
  private def ok(a: Expression, b: Expression): Boolean =
    a.deterministic && b.deterministic && !(a.foldable && b.foldable)

  /** `length(side)`, pre-folded for foldable sides: ConstantFolding
    * would fold it anyway on the next fixed-point pass, and the
    * injected guard must equal its OWN folded survivor or the
    * semantic-dedupe check stops recognizing it and the rule
    * re-injects every iteration (observed: a literal probe string
    * folded to `length = 12` and the guard doubled).
    */
  private def lengthOf(e: Expression): Expression = {
    val len = Length(e)
    if (e.foldable)
      Literal.create(
        len.eval(org.apache.spark.sql.catalyst.InternalRow.empty),
        len.dataType)
    else len
  }

  private def lenGuard(a: Expression, b: Expression,
      cmp: Expression => Expression): Expression =
    cmp(Abs(Subtract(lengthOf(a), lengthOf(b))))

  private def guardFor(conjunct: Expression): Option[Expression] =
    conjunct match {
      case LessThanOrEqual(Levenshtein(a, b, None), k)
          if intLit(k) && ok(a, b) =>
        Some(lenGuard(a, b, LessThanOrEqual(_, k)))
      case LessThan(Levenshtein(a, b, None), k)
          if intLit(k) && ok(a, b) =>
        Some(lenGuard(a, b, LessThan(_, k)))
      case GreaterThanOrEqual(Levenshtein(a, b, Some(th)), z)
          if intLit(th) && intLit(z) &&
            z.asInstanceOf[Literal].value == 0 && ok(a, b) =>
        Some(lenGuard(a, b, LessThanOrEqual(_, th)))
      // commuted spellings (r12 advice): hand-written SQL often puts
      // the literal first — `k >= levenshtein(a, b)` / `k >
      // levenshtein(a, b)` / `levenshtein(a, b) = k` all bound the
      // distance from above just the same, so they get the same
      // length guard (|len(a) − len(b)| ≤ distance always holds)
      case GreaterThanOrEqual(k, Levenshtein(a, b, None))
          if intLit(k) && ok(a, b) =>
        Some(lenGuard(a, b, LessThanOrEqual(_, k)))
      case GreaterThan(k, Levenshtein(a, b, None))
          if intLit(k) && ok(a, b) =>
        Some(lenGuard(a, b, LessThan(_, k)))
      case EqualTo(Levenshtein(a, b, None), k) if intLit(k) && ok(a, b) =>
        Some(lenGuard(a, b, LessThanOrEqual(_, k)))
      case EqualTo(k, Levenshtein(a, b, None)) if intLit(k) && ok(a, b) =>
        Some(lenGuard(a, b, LessThanOrEqual(_, k)))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap(guardFor)
        .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      // dedupe guards against each other too (two identical lev
      // conjuncts must not inject twice)
      val distinctGuards = guards.foldLeft(Seq.empty[Expression]) {
        (acc, g) => if (acc.exists(_.semanticEquals(g))) acc else acc :+ g
      }
      if (distinctGuards.isEmpty) f
      // PREPEND the guards: conjuncts evaluate left-to-right in the
      // generated code and FilterExec does not reorder them, so the
      // cheap length compare must sit BEFORE the levenshtein conjunct
      // to actually short-circuit the DP (appending it would run the
      // DP first and the guard on survivors only — pure overhead)
      else Filter(distinctGuards.foldLeft(cond)((c, g) => And(g, c)), child)
  }
}
