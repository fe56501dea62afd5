package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

import graft.functions.{VersionCmp, VersionKey}

/** SURVEY §4.2's optional Rule, the last sentence of the blueprint:
  * rewrite `version_cmp` RANGE joins into range-partitioned joins.
  *
  * The pattern is the version-interval join a vulnerability matcher
  * runs at scale — every (package, advisory-range) pair with NO
  * equi key:
  *
  *   pkg JOIN adv ON version_cmp(pkg.v, adv.lo) >= 0
  *               AND version_cmp(pkg.v, adv.hi) <  0
  *
  * Spark plans that as a nested-loop (broadcast if one side is
  * small, else cartesian) — quadratic work in ONE task chain at
  * 100 TB. The rewrite manufactures an equi key from the MONOTONE
  * version coarsening `version_key` (`VersionOps.key`: epoch << 41 |
  * first numeric run; null when the version is not numerically
  * keyable): a true match `lo <= v < hi` forces
  * `key(lo) <= key(v) <= key(hi)`, so ranges explode to their
  * covered key buckets, points map to their single bucket, and the
  * join becomes a hash equi-join on the bucket with the EXACT
  * original predicate as residual — each match lands in exactly the
  * point's bucket, no dedup. This is `RangeJoin.intervalJoin`'s
  * bucketization transplanted into the optimizer, where it also
  * catches plain SQL.
  *
  * Exactness is non-negotiable for an optimizer rule, so nothing is
  * ever dropped: the output is a UNION of three disjoint branches —
  *  A. keyed points x narrow ranges: bucket equi-join + residual;
  *  B. ALL points x fallback ranges (unkeyable bounds, empty-key
  *     ranges, spans over `spark.graft.versionIntervalJoin.maxSpan`):
  *     the original nested-loop, now over the (rare) residue only;
  *  C. unkeyable points x narrow ranges: ditto.
  * Branches B/C re-spell the bound conjuncts in the mirrored
  * `version_cmp(bound, v)` form — identical semantics (the
  * comparison is sign-anti-symmetric) but outside this rule's
  * pattern, so the fixpoint batch cannot refire on its own output;
  * branch A carries the bucket equi conjunct, which the eligibility
  * guard (no cross-side equi) already rejects.
  *
  * Scope guards: inner joins only; both bounds must compare the SAME
  * point expression in `version_cmp(v, bound) {>=,>} 0` /
  * `version_cmp(v, bound) {<,<=} 0` spelling with v from one side
  * and both bounds from the other; every involved expression
  * deterministic; disabled via
  * `spark.graft.versionIntervalJoin.enabled=false`. */
object VersionIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.versionIntervalJoin.enabled", "true") == "true"
  private def maxSpan: Long = SQLConf.get
    .getConfString("spark.graft.versionIntervalJoin.maxSpan", "1024").toLong

  // (point, bound, strict): version_cmp(v, lo) >= 0  /  > 0
  private def asLower(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(VersionCmp(v, lo), IntegerLiteral(0)) =>
        Some((v, lo, false))
      case GreaterThan(VersionCmp(v, lo), IntegerLiteral(0)) =>
        Some((v, lo, true))
      case _ => None
    }

  // (point, bound, strict): version_cmp(v, hi) < 0  /  <= 0
  private def asUpper(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case LessThan(VersionCmp(v, hi), IntegerLiteral(0)) =>
        Some((v, hi, true))
      case LessThanOrEqual(VersionCmp(v, hi), IntegerLiteral(0)) =>
        Some((v, hi, false))
      case _ => None
    }

  /** The semantics-preserving mirrored spelling (version_cmp is
    * sign-anti-symmetric), used in the fallback branches so this
    * rule's own output can never re-match its pattern. */
  private def mirror(conjunct: Expression): Expression = conjunct match {
    case GreaterThanOrEqual(VersionCmp(v, lo), l @ IntegerLiteral(0)) =>
      LessThanOrEqual(VersionCmp(lo, v), l)
    case GreaterThan(VersionCmp(v, lo), l @ IntegerLiteral(0)) =>
      LessThan(VersionCmp(lo, v), l)
    case LessThan(VersionCmp(v, hi), l @ IntegerLiteral(0)) =>
      GreaterThan(VersionCmp(hi, v), l)
    case LessThanOrEqual(VersionCmp(v, hi), l @ IntegerLiteral(0)) =>
      GreaterThanOrEqual(VersionCmp(hi, v), l)
    case other => other
  }

  private def fromOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // already hash-joinable (or our own branch A): leave it alone
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (fromOnly(a, left) && fromOnly(b, right)) ||
          (fromOnly(a, right) && fromOnly(b, left))
      case EqualNullSafe(a, b) =>
        (fromOnly(a, left) && fromOnly(b, right)) ||
          (fromOnly(a, right) && fromOnly(b, left))
      case _ => false
    }
    if (hasEqui) return None
    if (!cond.deterministic) return None

    val lowers = conjuncts.flatMap(c => asLower(c).map(c -> _))
    val uppers = conjuncts.flatMap(c => asUpper(c).map(c -> _))
    val pair = (for {
      (lc, (vL, lo, _)) <- lowers
      (uc, (vU, hi, _)) <- uppers
      if vL.semanticEquals(vU)
      // orientation: v from one side, BOTH bounds from the other
      ok = (fromOnly(vL, left) && fromOnly(lo, right) && fromOnly(hi, right)) ||
        (fromOnly(vL, right) && fromOnly(lo, left) && fromOnly(hi, left))
      if ok
    } yield (lc, uc, vL, lo, hi)).headOption
    pair.flatMap { case (lowerC, upperC, v, lo, hi) =>
      val pointOnLeft = fromOnly(v, left)
      val point = if (pointOnLeft) left else right
      val range = if (pointOnLeft) right else left

      // point side: materialize the bucket key
      val pkAlias = Alias(VersionKey(v), "_gvij_pk")()
      val pointKeyed = Project(point.output :+ pkAlias, point)
      val pk = pkAlias.toAttribute

      // range side: materialize both bound keys
      val loAlias = Alias(VersionKey(lo), "_gvij_lo")()
      val hiAlias = Alias(VersionKey(hi), "_gvij_hi")()
      val rangeKeyed = Project(range.output :+ loAlias :+ hiAlias, range)
      val (loA, hiA) = (loAlias.toAttribute, hiAlias.toAttribute)
      // never null (false under three-valued logic when a key is null)
      val narrowPred = And(And(IsNotNull(loA), IsNotNull(hiA)),
        And(LessThanOrEqual(Subtract(hiA, loA), Literal(maxSpan)),
          GreaterThanOrEqual(hiA, loA)))
      val rangeNarrow = Filter(narrowPred, rangeKeyed)
      val bucket = AttributeReference("_gvij_b", LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression — stays UNRESOLVED
      // without a zone even for pure long sequences
      val exploded = Generate(
        Explode(new Sequence(loA, hiA, Some(Literal(1L)))
          .withTimeZone(SQLConf.get.sessionLocalTimeZone)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bucket), child = rangeNarrow)

      // the fallback spelling: identical semantics, un-matchable
      val mirroredCond = conjuncts.map {
        case c if c.fastEquals(lowerC) || c.fastEquals(upperC) => mirror(c)
        case c => c
      }.reduce(And)

      // the original hint survives the rewrite (a user-forced
      // broadcast should keep forcing the branch joins)
      def sided(p: LogicalPlan, r: LogicalPlan, c: Expression): Join =
        if (pointOnLeft) Join(p, r, Inner, Some(c), j.hint)
        else Join(r, p, Inner, Some(c), j.hint)

      val branchA = Project(j.output,
        sided(Filter(IsNotNull(pk), pointKeyed), exploded,
          And(EqualTo(pk, bucket), cond)))
      val branchB = Project(j.output,
        sided(point, Filter(Not(narrowPred), rangeKeyed), mirroredCond))
      val branchC = Project(j.output,
        sided(Filter(IsNull(pk), pointKeyed), Filter(narrowPred, rangeKeyed),
          mirroredCond))
      Some(Union(Seq(branchA, branchB, branchC), byName = false,
        allowMissingCol = false))
    }
  }
}
