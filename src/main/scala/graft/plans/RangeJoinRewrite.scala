package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a range-containment theta join
  * `probe JOIN ranges ON x >= lo AND x < hi` — which Spark can only
  * plan as a nested-loop join (every probe row tests every range) —
  * into the bucket-expansion EQUI-join of functions/RangeJoin, fully
  * inside the optimizer:
  *
  *   probe+bucket(x div W)  ⋈__bucket  ranges×explode(sequence(lo div W,
  *   (hi-1) div W))  [residual: original range predicate]
  *
  * After the rewrite the join carries an equality conjunct, so Catalyst
  * plans a shuffled hash / sort-merge join like any other equi-join —
  * the user keeps writing the natural predicate and the plan stops
  * being quadratic. This is the engine's `Rule[LogicalPlan]` extension
  * surface (SURVEY §4): expressions weren't enough here because the fix
  * is a PLAN rewrite, not a scalar.
  *
  * Correctness guards:
  *  - fires ONLY on a resolved inner join whose condition is the
  *    two-conjunct half-open containment `x >= lo AND x < hi` with
  *    long-typed attributes, x from one side and lo/hi from the other
  *    (either orientation). All equivalent spellings canonicalize
  *    before matching (`lo <= x`, `hi > x`, either conjunct order) —
  *    the rewritten condition has a different shape (an EqualTo
  *    conjunct wrapping the original And), so the rule cannot re-fire;
  *  - a `hi > lo` filter precedes the explode: such rows can never
  *    match the original predicate, and `sequence()` would reject a
  *    descending span;
  *  - truncating `div` is monotone non-decreasing, so bucket
  *    completeness holds for negative values too;
  *  - the ORIGINAL predicate rides along as the residual conjunct —
  *    false bucket candidates are filtered exactly.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** The rewrite is OPT-IN per session: it fires only when this conf
    * is set to a positive bucket width. Reason: the explode emits
    * ceil((hi-lo)/W) rows per range, so W must be chosen against the
    * actual interval widths — a globally-on rule with a fixed W would
    * turn a wide-interval join (epoch-millis ranges, a [0, MaxValue)
    * sentinel row) from a slow-but-finishing nested loop into a row
    * explosion or a sequence() overflow. Same contract as the
    * published range-join hints: the user names the bin size. */
  val WidthConf = "spark.graft.rangejoin.bucketWidth"

  private def bucketWidth: Option[Long] = {
    val raw = conf.getConfString(WidthConf, "")
    if (raw.isEmpty) None
    else {
      // the user explicitly opted in — a typo'd or non-positive value
      // must ERROR, not silently fall back to the nested-loop plan
      // (a silent perf cliff with no diagnostic)
      val v = raw.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"$WidthConf must be a positive long, got '$raw'"))
      require(v > 0, s"$WidthConf must be positive, got $v")
      Some(v)
    }
  }

  private case class Shape(x: Attribute, lo: Attribute, hi: Attribute,
                           probeLeft: Boolean)

  // Semantically identical spellings must all fire (ADVICE r4: matching
  // only the literal `x >= lo AND x < hi` left `lo <= x`, `hi > x`, and
  // swapped-conjunct forms silently on the nested-loop plan — the same
  // silent perf cliff the width-validation error exists to prevent).
  // Each conjunct canonicalizes to "x >= lo" / "x < hi" regardless of
  // operand order; the two conjuncts are tried in both orders.
  private def asGeq(e: Expression): Option[(Attribute, Attribute)] = e match {
    case GreaterThanOrEqual(x: Attribute, lo: Attribute) => Some((x, lo))
    case LessThanOrEqual(lo: Attribute, x: Attribute) => Some((x, lo))
    case _ => None
  }

  private def asLt(e: Expression): Option[(Attribute, Attribute)] = e match {
    case LessThan(x: Attribute, hi: Attribute) => Some((x, hi))
    case GreaterThan(hi: Attribute, x: Attribute) => Some((x, hi))
    case _ => None
  }

  private def shape(cond: Expression, left: LogicalPlan,
                    right: LogicalPlan): Option[Shape] = cond match {
    case And(c1, c2) =>
      Seq((c1, c2), (c2, c1)).view.flatMap { case (g, lt) =>
        for {
          (x, lo) <- asGeq(g)
          (x2, hi) <- asLt(lt)
          if x.semanticEquals(x2) &&
            Seq(x, lo, hi).forall(_.dataType == LongType)
          s <-
            if (left.outputSet.contains(x) &&
                right.outputSet.contains(lo) && right.outputSet.contains(hi))
              Some(Shape(x, lo, hi, probeLeft = true))
            else if (right.outputSet.contains(x) &&
                left.outputSet.contains(lo) && left.outputSet.contains(hi))
              Some(Shape(x, lo, hi, probeLeft = false))
            else None
        } yield s
      }.headOption
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = bucketWidth match {
    case None => plan // conf unset: rule is inert
    case Some(width) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        shape(cond, left, right) match {
          case None => j
          case Some(Shape(x, lo, hi, probeLeft)) =>
            val w = Literal(width)
            val probe = if (probeLeft) left else right
            val ranges = if (probeLeft) right else left
            // probe side: __rj_bucket = x div W
            val bAlias = Alias(IntegralDivide(x, w), "__rj_bucket")()
            val probeB = Project(probe.output :+ bAlias, probe)
            // ranges side: drop impossible rows, explode covered buckets
            val nonEmpty = Filter(GreaterThan(hi, lo), ranges)
            val gOut = AttributeReference("__rj_bucket", LongType)()
            // timeZoneId must be set for Sequence to count as resolved
            // (TimeZoneAwareExpression contract) — irrelevant for longs
            val seq = new Sequence(
              IntegralDivide(lo, w),
              IntegralDivide(Subtract(hi, Literal(1L)), w),
              Some(Literal(1L)), Some("UTC"))
            val gen = Generate(Explode(seq), Nil, outer = false, None,
              Seq(gOut), nonEmpty)
            val eq = EqualTo(bAlias.toAttribute, gOut)
            val (nl, nr) = if (probeLeft) (probeB, gen) else (gen, probeB)
            // original probe/ranges columns survive; the helper buckets
            // are pruned away by column pruning above this join
            Project(j.output,
              Join(nl, nr, Inner, Some(And(eq, cond)), hint))
        }
    }
  }
}
