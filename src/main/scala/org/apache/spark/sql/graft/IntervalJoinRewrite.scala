package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite an interval-OVERLAP theta join into a binned
  * equi-join with exactly-once pair emission.
  *
  * The next rung on the extension ladder after [[RangeJoinRewrite]]: that
  * rule handles a BAND on one attribute pair (`L <= x - y <= U`); this one
  * handles the four-attribute overlap shape
  * {{{ a.lo <= b.hi AND b.lo <= a.hi   -- any strictness, ± constants }}}
  * — the predicate of session×window, validity-interval, and
  * reservation-conflict joins — which Spark otherwise plans as a
  * BroadcastNestedLoopJoin (every left row against every right row).
  * Point-in-interval joins (`b.lo <= p AND p <= b.hi`) are the degenerate
  * case `a.lo = a.hi = p` and rewrite the same way; pure bands (both
  * bounds on the SAME pair) are left to [[RangeJoinRewrite]].
  *
  * The rewrite explodes each side into the fixed-width time bins its
  * interval touches (`Sequence` of floor-divided bin ids) and equi-joins
  * on the bin. Two overlapping intervals share every bin of their
  * overlap, so a naive binned join emits duplicates; instead of a dedup
  * shuffle the join keeps a pair only in the ONE bin containing
  * `greatest(a.lo, b.lo)` — a point both intervals provably contain
  * whenever the original predicate holds (if `greatest = a.lo` it is
  * inside `[b.lo, b.hi]` by the two conjuncts, and vice versa; with a
  * `+k` constant shift the exploded range is widened by `max(k, 0)` so
  * the containment survives). The ORIGINAL condition is kept as a
  * residual filter above the join, so semantics are multiset-exact:
  * every qualifying pair appears exactly once and duplicates of input
  * rows stay distinct. Rows with a NULL endpoint are pruned by explicit
  * IsNotNull guards under the Generates — the inner join's comparisons
  * could never accept them, so dropping them early is free (without the
  * guards, Least/Greatest SKIP nulls and a one-null-endpoint row would
  * still explode into bins only to die in the residual filter).
  *
  * OUTLIER ROWS — intervals spanning more than
  * `spark.graft.intervalJoinRewrite.maxBinsPerRow` bins (default 4096;
  * this includes the saturating widen for endpoints near
  * Long.MaxValue) — are split out BEFORE the explosion and joined by
  * the original nested-loop path instead: a 10^6-bin outlier must not
  * materialize a 10^6-element Sequence (array-size failure / memory
  * blowup), and for rows that wide the nested loop IS the cheaper
  * plan. The result is the union small×small binned ∪ big×all nested
  * ∪ small×big nested — still multiset-exact, each qualifying pair
  * emitted by exactly one branch. The fallback joins wrap their
  * condition in the opaque [[GraftNoRewrite]] marker so neither join
  * rewrite re-fires on them under fixed-point optimization. The price
  * of the safety net is that each input subtree is evaluated once more
  * for its (usually empty) outlier branch; a caller who KNOWS interval
  * lengths are bounded sets `maxBinsPerRow=0` to drop the fallback
  * branches entirely and restore the single-branch plan (outliers then
  * fail the query, the pre-cap behavior).
  *
  * Unlike the band rule this one needs a BIN WIDTH — a physical tuning
  * choice that depends on typical interval length, which no static
  * analysis can derive (Databricks ships the same requirement as its
  * range-join hint). The rule therefore only fires when
  * `spark.graft.intervalJoinRewrite.binWidth` is set (positive long, in
  * the unit of the interval attributes); rows explode into
  * `len/width + 1` copies, so set it near the TYPICAL interval length.
  * Disable entirely with `spark.graft.intervalJoinRewrite.enabled=false`.
  *
  * Preconditions, checked in [[tryRewrite]]:
  *  - inner/cross batch join, no cross-side equi conjunct (Spark already
  *    hashes on one), not already rewritten by either join rule;
  *  - two conjuncts normalizing (via [[JoinRewriteMath.bandOf]]) to an
  *    upper band `a.lo - b.hi <= k1` and a lower band `a.hi - b.lo >=
  *    k2` on DIFFERENT attribute pairs, all integral, |k| < 2^50;
  *  - bin ids use overflow-proof floor division (quotient fix-up, no
  *    subtract that can underflow) and the `+k` widening is a saturating
  *    add in bin space, so no generated arithmetic can overflow for ANY
  *    long input — the same guarantee the band rule gets from its
  *    decimal bucket bases.
  */
/** Opaque pass-through marker: wraps the fallback joins' condition so
  * no conjunct inside is visible to either join-rewrite rule (an opaque
  * single conjunct yields no bands) and no built-in rule can fold it
  * away under fixed-point optimization (non-foldable by fiat — a
  * foldable always-true tag conjunct was constant-folded out, the rule
  * re-fired on its own fallback joins every optimizer iteration, and
  * the plan grew without bound). Evaluation and codegen delegate to the
  * child unchanged.
  */
case class GraftNoRewrite(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): GraftNoRewrite =
    copy(child = newChild)
}

object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  import JoinRewriteMath._

  private val BinAttrName = "__graft_bin"

  /** Overflow-proof floor(x / w) for longs: fix up the truncated
    * quotient when the remainder is negative. No subtraction on x, so no
    * underflow for any input; q-1 cannot underflow because q =
    * Long.MinValue requires w = 1, whose remainder is 0.
    */
  private def floorDiv(x: Expression, w: Long): Expression = {
    val xl = Cast(x, LongType)
    val q  = IntegralDivide(xl, Literal(w))
    val r  = Remainder(xl, Literal(w))
    If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
  }

  /** Bin ids an interval [lo, hi+max(k,0)] touches, as a Sequence — the
    * Least/Greatest keeps the sequence ascending even for malformed
    * (hi < lo) intervals, whose rows the residual filter judges. The +k
    * widening happens in BIN space with a saturating add (floor((hi+k)/w)
    * <= floor(hi/w) + k/w + 1, and over-covering by one bin is harmless —
    * coverage only needs to be a superset), so no endpoint arithmetic can
    * overflow for ANY long input, matching the band rule's decimal
    * bucket-base guarantee.
    */
  private def binSeq(lo: Expression, hi: Expression, k: Long, w: Long): Expression = {
    val b1 = floorDiv(lo, w)
    val bHi = floorDiv(hi, w)
    val b2 =
      if (k <= 0) bHi
      else {
        val c = k / w + 1
        If(
          GreaterThan(bHi, Literal(Long.MaxValue - c)),
          Literal(Long.MaxValue),
          Add(bHi, Literal(c)))
      }
    // post-analysis rules must supply the timezone themselves: Sequence
    // is TimeZoneAwareExpression and stays UNRESOLVED without one (the
    // analyzer's ResolveTimeZone has already run)
    new Sequence(
      Least(Seq(b1, b2)),
      Greatest(Seq(b1, b2)),
      Some(Literal(1L)),
      Some(SQLConf.get.sessionLocalTimeZone))
  }

  /** True iff the interval's bin SEQUENCE (same b1/b2 as [[binSeq]],
    * including the saturating widen) has at most `cap` elements —
    * `bMax - bMin + 1 <= cap`, i.e. `bMax - cap < bMin` — so
    * `maxBinsPerRow=N` really bounds the materialized array length at N.
    * Overflow-proof: `bMax - cap` is only evaluated when it cannot
    * underflow; when it would, `bMax - bMin < cap` holds necessarily.
    */
  private def fitsCap(
      lo: Expression, hi: Expression, k: Long, w: Long, cap: Long): Expression = {
    val b1 = floorDiv(lo, w)
    val bHi = floorDiv(hi, w)
    val b2 =
      if (k <= 0) bHi
      else {
        val c = k / w + 1
        If(
          GreaterThan(bHi, Literal(Long.MaxValue - c)),
          Literal(Long.MaxValue),
          Add(bHi, Literal(c)))
      }
    val bMin = Least(Seq(b1, b2))
    val bMax = Greatest(Seq(b1, b2))
    If(
      GreaterThanOrEqual(bMax, Literal(Long.MinValue + cap)),
      LessThan(Subtract(bMax, Literal(cap)), bMin),
      Literal(true))
  }

  private def tryRewrite(
      l: LogicalPlan,
      r: LogicalPlan,
      cond: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // never re-fire on a join either rewrite rule already built
    if (conjuncts.exists(_.references.exists(a =>
        a.name == BinAttrName || a.name == "__graft_band"))) return None
    if (cond.exists(_.isInstanceOf[GraftNoRewrite])) return None
    if (hasCrossEquiKey(conjuncts, l, r)) return None
    val width = SQLConf.get
      .getConfString("spark.graft.intervalJoinRewrite.binWidth", "")
    if (width.isEmpty) return None
    val w = try width.toLong catch { case _: NumberFormatException => return None }
    if (w < 1) return None

    val bands = conjuncts.flatMap(bandOf(_, l, r))
    // upper band: aLo - bHi <= k1  (aLo left, bHi right)
    // lower band: aHi - bLo >= k2  (aHi left, bLo right)
    val pairs = for {
      u <- bands.filter(b => b.upper && math.abs(b.bound) < MaxBound)
      d <- bands.filter(b => !b.upper && math.abs(b.bound) < MaxBound)
      // a different pair — identical pairs are a pure band, the
      // RangeJoinRewrite shape, not an interval overlap
      if (u.la.exprId, u.rb.exprId) != (d.la.exprId, d.rb.exprId)
    } yield (u, d)
    pairs.headOption.map { case (u, d) =>
      val (aLo, bHi, k1) = (u.la, u.rb, u.bound)
      val (aHi, bLo, k2) = (d.la, d.rb, -d.bound)
      val cap = SQLConf.get
        .getConfString("spark.graft.intervalJoinRewrite.maxBinsPerRow", "4096")
        .toLong max 0L
      val split = cap > 0

      // null-endpoint rows can never satisfy the inner join's
      // comparisons — prune them before any explosion
      val lNn = Filter(And(IsNotNull(aLo), IsNotNull(aHi)), l)
      val rNn = Filter(And(IsNotNull(bLo), IsNotNull(bHi)), r)
      // split outlier intervals (bin span > cap) out of the binned path
      val lFits = fitsCap(aLo, aHi, k2, w, cap)
      val rFits = fitsCap(bLo, bHi, k1, w, cap)
      val lSmall = if (split) Filter(lFits, lNn) else lNn
      val rSmall = if (split) Filter(rFits, rNn) else rNn

      // left side: bins of [aLo, aHi + max(k2, 0)]
      val lBinAttr = AttributeReference(BinAttrName, LongType)()
      val lGen = Generate(
        Explode(binSeq(aLo, aHi, k2, w)),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(lBinAttr),
        child = lSmall)
      // right side: bins of [bLo, bHi + max(k1, 0)]
      val rBinAttr = AttributeReference(BinAttrName, LongType)()
      val rGen = Generate(
        Explode(binSeq(bLo, bHi, k1, w)),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(rBinAttr),
        child = rSmall)

      // exactly-once: keep the pair only in the bin that contains
      // greatest(aLo, bLo) — present in both sides' sequences whenever
      // the original predicate holds. Cast BOTH operands: the analyzer's
      // widening casts were stripped by decompose, so mixed int/long
      // endpoint columns would otherwise hand Greatest an invalid
      // mixed-type argument list (no type coercion after analysis).
      val onceBin = floorDiv(
        Greatest(Seq(Cast(aLo, LongType), Cast(bLo, LongType))), w)
      val joinCond = And(
        EqualTo(lBinAttr, rBinAttr),
        EqualTo(lBinAttr, onceBin))
      val binned = Project(
        l.output ++ r.output,
        Filter(cond, Join(lGen, rGen, Inner, Some(joinCond), hint)))

      // outlier fallback: big-left × all-right plus small-left ×
      // big-right through the ORIGINAL nested-loop join — exact, and
      // the three branches partition the qualifying pairs (each pair's
      // membership is decided by its two rows' fits flags). The
      // condition is wrapped in the opaque GraftNoRewrite marker so the
      // fixed-point optimizer can't re-fire either join rewrite on it.
      def fallback(left: LogicalPlan, right: LogicalPlan): LogicalPlan =
        Project(
          l.output ++ r.output,
          Join(left, right, Inner, Some(GraftNoRewrite(cond)), hint))
      if (!split) binned
      else {
        val bigL = fallback(Filter(Not(lFits), lNn), rNn)
        val bigR = fallback(lSmall, Filter(Not(rFits), rNn))
        Union(Seq(binned, bigL, bigR))
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = SQLConf.get
      .getConfString("spark.graft.intervalJoinRewrite.enabled", "true") == "true"
    if (!enabled) plan
    else
      plan.transformUp {
        case j @ Join(l, r, Inner | Cross, Some(cond), hint)
            if !l.isStreaming && !r.isStreaming =>
          tryRewrite(l, r, cond, hint).getOrElse(j)
      }
  }
}
