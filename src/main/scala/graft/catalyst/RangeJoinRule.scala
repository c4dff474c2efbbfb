package graft.catalyst

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule that rewrites point-in-interval theta joins into the
  * bucketed equi-join [[graft.ops.RangeJoin]] builds by hand.
  *
  * The reference's signature operator is `lo <= v AND v <= hi` against a
  * mass table (queryMassNPDB_mod.py:127-141); Spark plans that bare theta
  * join as BroadcastNestedLoopJoin — O(|A|·|B|). This rule detects the
  * shape on INNER joins and rewrites
  *
  * {{{ A ⨝_{lo ≤ v ≤ hi} B }}}
  * into
  * {{{ Project(A.out ++ B.out,
  *       (A + explode(sequence(floor(lo/w), floor(hi/w))) AS __bucket_i)
  *       ⨝_{__bucket_i = floor(v/w) AND lo ≤ v ≤ hi} B) }}}
  *
  * which Spark then plans as a shuffled equi join with a residual filter —
  * the same single-shuffle plan `RangeJoin.pointInInterval` produces, but
  * available to ANY DataFrame/SQL theta join without calling the library.
  *
  * Deliberately conservative:
  *  - opt-in: fires only when `spark.graft.rangeJoin.bucketWidth` is set
  *    to a positive double (the caller knows the interval scale; a wrong
  *    width is correct but slow — each interval should span ≤2-3 buckets);
  *  - inner joins only, and only when the condition has NO equi conjunct
  *    between the sides (an equi conjunct already gives a hash join, and
  *    the guard also makes the rule idempotent — its own rewrite adds one);
  *  - the full original predicate is kept as the residual filter, so the
  *    rewrite can never change results (bucket membership is a superset
  *    of interval membership; NULL endpoints kill the row on both paths).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def width: Option[Double] =
    try {
      val s = conf.getConfString(WidthKey, "")
      if (s.isEmpty) None else Some(s.toDouble).filter(_ > 0)
    } catch { case _: NumberFormatException => None }

  /** lo/hi bound pair for a point expression from the other side. */
  private case class RangeSides(point: Expression, lo: Expression, hi: Expression)

  /** The rewrite buckets via numeric division, so it is only meaning-
    * preserving for numeric operands: a lexicographic string range
    * ("10" <= v <= "9") or a date/interval comparison must never match. */
  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic && e.dataType.isInstanceOf[NumericType]

  /** Match one conjunct as `point (from `pt` side) bounded below/above by
    * an expression from `bound` side`; returns (point, boundExpr, isLower). */
  private def asBound(c: Expression, pt: LogicalPlan, bound: LogicalPlan)
      : Option[(Expression, Expression, Boolean)] = c match {
    case LessThanOrEqual(l, r) if from(l, bound) && from(r, pt) => Some((r, l, true))   // lo <= v
    case LessThan(l, r)        if from(l, bound) && from(r, pt) => Some((r, l, true))
    case GreaterThanOrEqual(l, r) if from(l, pt) && from(r, bound) => Some((l, r, true)) // v >= lo
    case GreaterThan(l, r)     if from(l, pt) && from(r, bound) => Some((l, r, true))
    case LessThanOrEqual(l, r) if from(l, pt) && from(r, bound) => Some((l, r, false))  // v <= hi
    case LessThan(l, r)        if from(l, pt) && from(r, bound) => Some((l, r, false))
    case GreaterThanOrEqual(l, r) if from(l, bound) && from(r, pt) => Some((r, l, false)) // hi >= v
    case GreaterThan(l, r)     if from(l, bound) && from(r, pt) => Some((r, l, false))
    case _ => None
  }

  /** Find a (point, lo, hi) triple with the point on `pt` and both bounds
    * on `bound`, from the conjunct list. */
  private def findRange(conjuncts: Seq[Expression], pt: LogicalPlan,
                        bound: LogicalPlan): Option[RangeSides] = {
    val bounds = conjuncts.flatMap(asBound(_, pt, bound))
    val byPoint = bounds.groupBy(_._1.canonicalized)
    byPoint.values.collectFirst {
      case bs if bs.exists(_._3) && bs.exists(!_._3) =>
        RangeSides(bs.head._1,
          bs.collectFirst { case (_, b, true) => b }.get,
          bs.collectFirst { case (_, b, false) => b }.get)
    }
  }

  private def hasEquiConjunct(conjuncts: Seq[Expression], l: LogicalPlan,
                              r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (from(a, l) && from(b, r)) || (from(a, r) && from(b, l))
      case EqualNullSafe(a, b) =>
        (from(a, l) && from(b, r)) || (from(a, r) && from(b, l))
      case _ => false
    }

  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !hasEquiConjunct(splitConjunctivePredicates(cond), left, right) =>
        val conjuncts = splitConjunctivePredicates(cond)
        // prefer intervals on the left (matches RangeJoin.pointInInterval's
        // argument order); fall back to the mirrored assignment
        val found = findRange(conjuncts, right, left).map(rs => (rs, true))
          .orElse(findRange(conjuncts, left, right).map(rs => (rs, false)))
        found match {
          case None => j
          case Some((RangeSides(v, lo, hi), pointOnRight)) =>
            val (intervalSide, pointSide) =
              if (pointOnRight) (left, right) else (right, left)
            val bucketI = AttributeReference("__graft_bucket_i", LongType,
              nullable = false)()
            // Sequence is TimeZoneAware: without an explicit zone the new
            // node is unresolved and plan validation rejects the rewrite.
            // Inverted intervals (lo > hi) match nothing, but a bare
            // Sequence would enumerate them DESCENDING — potentially many
            // buckets per dead row — so they emit zero buckets instead.
            val loB = bucketOf(lo, w)
            val hiB = bucketOf(hi, w)
            val seq = If(LessThanOrEqual(loB, hiB),
              Sequence(loB, hiB, None, Some(conf.sessionLocalTimeZone)),
              Literal.create(Array.empty[Long],
                org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
            val gen = Generate(
              Explode(seq),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(bucketI), child = intervalSide)
            val bucketV = Alias(bucketOf(v, w), "__graft_bucket_v")()
            val proj = Project(pointSide.output :+ bucketV, pointSide)
            val newCond = And(EqualTo(bucketI, bucketV.toAttribute), cond)
            val newJoin =
              if (pointOnRight) Join(gen, proj, Inner, Some(newCond), hint)
              else Join(proj, gen, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
        }
    }
  }
}
