package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Restores parquet predicate pushdown through the measure-column read
  * boundary ([[graft.Tables.measureCols]]).
  *
  * The boundary projects every measure/money DOUBLE through
  *
  *   CASE WHEN isnan(c) OR abs(c) = Infinity THEN NULL ELSE c END
  *
  * so garbage floats hit ordinary SQL NULL semantics (the r14
  * dirty-data contract). Catalyst happily pushes a query filter through
  * that projection — but the condition it lands on the scan with
  * compares against the CASE expression, which the parquet source
  * cannot translate, so the scan loses `PushedFilters` for every
  * measure predicate (r14 VERDICT: q6 lost its discount/quantity
  * envelope, q19 its stated quantity hull, q22 its acctbal filters —
  * at 100 TB that is lost row-group pruning on every measure-filtered
  * scan).
  *
  * The fix is inference, not relocation: when the sanitized predicate
  * holds, the CASE returned the RAW column (non-null, finite), so the
  * same comparison on the raw column is implied and may be added as a
  * redundant conjunct — and THAT conjunct is a plain
  * attribute-vs-literal comparison the source translates. Concretely,
  * for each Filter conjunct:
  *
  *   sanitized(c) op lit   ==>  add `c op lit` and `IsNotNull(c)`
  *   sanitized(c) op expr  ==>  add `IsNotNull(c)`   (expr deterministic)
  *   IsNotNull(sanitized(c)) ==> add `IsNotNull(c)`
  *   sanitized(c) IN (lits)  ==> add `c IN (lits)` and `IsNotNull(c)`
  *
  * and, since the implication is monotone, whole And/Or predicate
  * TREES over those leaf shapes get a raw image too ([[rawImage]] —
  * q19's branch disjunction over sanitized quantity is the motivating
  * case; r15's leaf-only rule restored the hull but lost the Or atom).
  *
  * Soundness: the added conjuncts are implied by the originals, so the
  * AND keeps exactly the original row set — rows the original predicate
  * keeps satisfy `sanitized(c) = c` (the CASE fell through to the else
  * branch), hence satisfy the raw form; rows it drops stay dropped
  * under AND. NaN/±Inf rows evaluate the ORIGINAL conjunct to NULL and
  * are dropped regardless of what the raw conjunct says, so Spark's
  * NaN-greatest comparison semantics never rescue a row. Parquet
  * row-group pruning over the pushed raw predicate is backstopped by
  * the retained FilterExec (Spark re-evaluates the full condition after
  * the scan), and non-finite values only ever WIDEN parquet min/max
  * stats, so pruning can never skip a group containing a row the full
  * condition accepts.
  *
  * `EqualNullSafe` is excluded: `sanitized(c) <=> NULL` is TRUE for a
  * NaN row while `c <=> NULL` is false — the one comparison where the
  * substitution is unsound.
  *
  * Runs with [[LevenshteinBandRule]]'s registration (GraftExtensions /
  * experimental.extraOptimizations, i.e. after the main optimizer): by
  * then predicate pushdown has substituted the projection's aliases, so
  * every boundary CASE sits in a scan-adjacent Filter — including the
  * IsNotNull(CASE(..)) conjuncts that InferFiltersFromConstraints
  * derives from joins/filters on sanitized columns. Idempotent: implied
  * conjuncts already present (semantically) are not re-added.
  */
object SanitizedMeasurePushdown extends Rule[LogicalPlan] with PredicateHelper {

  private object NullLit {
    def unapply(e: Expression): Boolean = e match {
      case Literal(null, _) => true
      case Cast(Literal(null, _), _, _, _) => true
      case _ => false
    }
  }

  /** abs(a) = +Infinity, either operand order. */
  private object InfAbs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case EqualTo(Abs(a: Attribute, _), Literal(d: Double, DoubleType))
        if d.isPosInfinity => Some(a)
      case EqualTo(Literal(d: Double, DoubleType), Abs(a: Attribute, _))
        if d.isPosInfinity => Some(a)
      case _ => None
    }
  }

  /** The boundary's guard condition over a single attribute:
    * isnan(a) OR abs(a) = Inf (either operand order). */
  private[plans] object SanitizeGuard {
    def unapply(e: Expression): Option[Attribute] = e match {
      case Or(IsNaN(x: Attribute), InfAbs(y)) if x.semanticEquals(y) => Some(x)
      case Or(InfAbs(y), IsNaN(x: Attribute)) if x.semanticEquals(y) => Some(x)
      case _ => None
    }
  }

  /** The read boundary's sanitize shape over a single attribute:
    * CASE WHEN isnan(a) OR abs(a) = Inf THEN NULL ELSE a END. */
  private[plans] object Sanitized {
    def unapply(e: Expression): Option[Attribute] = e match {
      case CaseWhen(Seq((SanitizeGuard(g), nl)), Some(a: Attribute))
        if NullLit.unapply(nl) && g.semanticEquals(a) => Some(a)
      case _ => None
    }
  }

  private def isFalseOrNull(e: Expression): Boolean = e match {
    case Literal(false, _) => true
    case Literal(null, _) => true
    case _ => false
  }

  /** IsNotNull conjuncts for the attributes a null-intolerant predicate
    * pins non-null (the shapes this rule emits / lifts). */
  private def notNulls(e: Expression): Seq[Expression] = e match {
    case cmp: BinaryComparison if !cmp.isInstanceOf[EqualNullSafe] =>
      cmp.children.collect { case a: Attribute => IsNotNull(a) }
    case In(a: Attribute, _) => Seq(IsNotNull(a))
    case _ => Nil
  }

  private def atomic(e: Expression): Boolean = e match {
    case _: Attribute => true
    case _: Literal => true
    case _ => false
  }

  /** Predicate shapes that cannot raise on ANY row: And/Or/Not trees
    * over comparisons, In, and null/NaN tests whose operands are bare
    * attributes or literals — no casts, no arithmetic, no function
    * calls (under ANSI those THROW on the very rows a guard excludes:
    * `cast(a AS INT)` on NaN, division by zero, abs(Int.MinValue)).
    * The CaseWhen lift may only hoist an else of this shape past its
    * guard; r16 shipped the lift protected merely by conjunct ORDER —
    * originals-first in `(conjuncts ++ extra).reduce(And)` plus And
    * short-circuit — which a later optimizer pass or a pushdown
    * translator is free to undo. Safe by construction instead. */
  private def nonThrowing(e: Expression): Boolean = e match {
    case And(l, r) => nonThrowing(l) && nonThrowing(r)
    case Or(l, r) => nonThrowing(l) && nonThrowing(r)
    case Not(c) => nonThrowing(c)
    case IsNotNull(c) => atomic(c)
    case IsNull(c) => atomic(c)
    case IsNaN(c) => atomic(c)
    case cmp: BinaryComparison => cmp.children.forall(atomic)
    case In(v, list) => atomic(v) && list.forall(atomic)
    case _ => false
  }

  /** Raw-column conjuncts implied by one original conjunct. Two shapes
    * arrive at the scan, depending on whether the comparison's other
    * side folded:
    *
    *  - literal comparisons get rewritten by PushFoldableIntoBranches +
    *    ReplaceNullWithFalseInPredicate into
    *    `CASE WHEN guard THEN false ELSE (raw op lit) END` — for ANY
    *    CaseWhen whose branch values are all false/null, the conjunct
    *    being true forces the ELSE branch to be true, so the else
    *    predicate lifts out verbatim (no substitution, sound for any
    *    guard);
    *  - non-foldable comparisons (scalar cutoffs, column-vs-column) and
    *    constraint-inferred IsNotNull keep the value-form CASE, matched
    *    by [[Sanitized]].
    */
  private def implied(c: Expression): Seq[Expression] = c match {
    case CaseWhen(branches, Some(e))
      if branches.nonEmpty && branches.forall(b => isFalseOrNull(b._2)) &&
        branches.forall(b => SanitizeGuard.unapply(b._1).isDefined) &&
        nonThrowing(e) =>
      // both restrictions keep the lift honest: only the boundary's
      // own guard shape lifts (r16), and only a provably non-throwing
      // else lifts past it (r17) — a sanitize-guarded CASE protecting
      // an ANSI cast/division keeps its guard, because the lifted
      // conjunct is evaluated on the very rows the guard excluded
      e +: notNulls(e)
    case IsNotNull(Sanitized(a)) => Seq(IsNotNull(a))
    case _: EqualNullSafe => Nil // NULL <=> sanitized(NaN) is TRUE; unsound
    case cmp: BinaryComparison => (cmp.left, cmp.right) match {
      case (Sanitized(a), r) if r.deterministic && !r.references.contains(a) =>
        IsNotNull(a) +: (r match {
          case _: Literal => Seq(cmp.withNewChildren(Seq(a, r)))
          case _ => Nil
        })
      case (l, Sanitized(a)) if l.deterministic && !l.references.contains(a) =>
        IsNotNull(a) +: (l match {
          case _: Literal => Seq(cmp.withNewChildren(Seq(l, a)))
          case _ => Nil
        })
      case _ => Nil
    }
    case In(Sanitized(a), list) if list.forall(_.isInstanceOf[Literal]) =>
      Seq(IsNotNull(a), In(a, list))
    case _ => Nil
  }

  private def hasCaseWhen(e: Expression): Boolean =
    e.exists(_.isInstanceOf[CaseWhen])

  /** Raw image of a predicate TREE (r15 found the leaf-only rule loses
    * disjunctions: q19's branch Or over sanitized quantity arrived as
    * one conjunct and no leaf matched). The implication is monotone,
    * so an implied raw predicate exists compositionally:
    *
    *   rawImage(Or(a, b))  = Or(rawImage(a), rawImage(b))   both required
    *   rawImage(And(a, b)) = And of whichever sides have an image
    *   rawImage(leaf with a sanitize CASE) = the [[implied]] atoms
    *   rawImage(CaseWhen-free leaf) = the leaf itself (deterministic,
    *     subquery-free — trivially implied by itself)
    *
    * Soundness by induction: any row satisfying the original tree
    * satisfies its image (a true Or side implies its image, so the
    * image-Or holds; a true And implies every side, so any subset of
    * images holds; leaf images are implied per [[implied]]'s argument;
    * a CaseWhen-bearing leaf with no implied atoms — e.g.
    * EqualNullSafe — yields None and poisons any enclosing Or, never
    * an unsound image). */
  private def rawImage(e: Expression): Option[Expression] = e match {
    case And(l, r) => (rawImage(l), rawImage(r)) match {
      case (Some(a), Some(b)) => Some(And(a, b))
      case (a, b) => a.orElse(b)
    }
    case Or(l, r) => for (a <- rawImage(l); b <- rawImage(r)) yield Or(a, b)
    case leaf =>
      val atoms = implied(leaf)
      if (atoms.nonEmpty) Some(atoms.reduce(And))
      else if (!hasCaseWhen(leaf) && leaf.deterministic &&
        !SubqueryExpression.hasSubquery(leaf)) Some(leaf)
      else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val existing = ExpressionSet(conjuncts)
      val extra = ExpressionSet(conjuncts.flatMap {
          // an Or tree gets ONE image conjunct — and only when it
          // actually contains a sanitize CASE, so a plain disjunction
          // never re-adds itself
          case t: Or if hasCaseWhen(t) => rawImage(t).toSeq
          case c => implied(c)
        }.filter(_.references.subsetOf(child.outputSet)))
        .filterNot(existing.contains).toSeq
      if (extra.isEmpty) f
      else f.copy(condition = (conjuncts ++ extra).reduce(And))
  }
}
