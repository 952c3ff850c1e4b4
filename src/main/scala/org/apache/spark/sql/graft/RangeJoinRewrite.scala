package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure band (interval) theta join into a
  * banded equi-join.
  *
  * A join whose only cross-side predicates are range bounds — e.g.
  * `b.t > a.t AND b.t - a.t <= W` — has no equi key, so Spark plans a
  * BroadcastNestedLoopJoin (or a cartesian product): every left row is
  * compared against every right row. At 100 TB that is the single worst
  * plan the engine can emit. But a band predicate `L <= x - y <= U`
  * admits the classic bucketing argument: split the number line into
  * buckets of width W = U - L; then `bucket(x)` can only equal
  * `bucket(y + L)` or `bucket(y + L) + 1`. Emitting the right side twice
  * (its bucket and successor) turns the join into an EQUI join on the
  * bucket id with the original predicate kept as a residual filter —
  * hash-partitionable, AQE-skew-splittable, candidate volume O(rows
  * within 2W) instead of O(n²). `AsOf.nearEventPairs` hand-writes this
  * shape; the rule makes the naive declarative form get the same plan
  * automatically, completing the extension ladder next to
  * [[WindowTopKRewrite]].
  *
  * Conservative preconditions, checked in [[tryRewrite]]:
  *  - inner/cross join, batch (not streaming) on both sides;
  *  - NO cross-side equi conjunct (if one exists Spark already hashes on
  *    it; rewriting would perturb a working plan);
  *  - a conjunct pair normalizing to `L <= la - rb <= U` with `la` an
  *    integral attribute from the left, `rb` from the right, and L, U
  *    foldable integral bounds with L <= U (strict bounds are tightened
  *    by 1 — integral types only, which is also why the rule does not
  *    touch float/decimal/timestamp-typed bands);
  *  - bound magnitudes below 2^50, so the shifted bucket arithmetic
  *    cannot overflow a long for any epoch-scale input.
  *
  * The rewrite keeps the ORIGINAL join condition as a filter above the
  * new join, so semantics are exactly preserved (nulls: a null la/rb
  * made the original predicate false; here it makes the bucket id null,
  * which the equi join drops — same result). A pair can never match in
  * both replicas of the right row because the two emitted bucket ids
  * differ, so no dedup step is needed. The rule cannot re-fire on its
  * own output: the rewritten join's bucket-equality conjunct IS an equi
  * key, which the precondition rejects — the fixed-point batch
  * terminates.
  *
  * Disable with `spark.graft.rangeJoinRewrite.enabled=false` (specs use
  * this to diff plans and results against the nested-loop form). With
  * `spark.graft.rangeJoinRewrite.bandEquiJoins=true` (default false) the
  * rule also fires on joins that DO have an equi key, appending the band
  * bucket to the hash key — per-key candidate volume drops from O(rows
  * per key)² to O(rows per key within 2 band widths), the skew remedy
  * for hot keys in time-band joins, at the cost of a 2× right-side
  * replication.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxBound = 1L << 50

  /** A band conjunct normalized to `la - rb <= bound` (upper = true) or
    * `la - rb >= bound` (upper = false), with la from the left side and
    * rb from the right.
    */
  private case class Band(la: Attribute, rb: Attribute, bound: Long, upper: Boolean)

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  private def litLong(l: Literal): Option[Long] = l.value match {
    case v: java.lang.Byte    => Some(v.longValue)
    case v: java.lang.Short   => Some(v.longValue)
    case v: java.lang.Integer => Some(v.longValue)
    case v: java.lang.Long    => Some(v.longValue)
    case _                    => None
  }

  /** Linear decomposition of an integral expression into attribute
    * coefficients plus a constant; None when the expression is not a
    * ±1-coefficient linear form this rule understands.
    */
  private def decompose(e: Expression): Option[(Map[ExprId, (Attribute, Long)], Long)] =
    e match {
      case a: Attribute if isIntegral(a.dataType) =>
        Some(Map(a.exprId -> (a, 1L)) -> 0L)
      case l: Literal if isIntegral(l.dataType) =>
        litLong(l).map(v => Map.empty[ExprId, (Attribute, Long)] -> v)
      case Add(x, y, _) =>
        for ((cx, kx) <- decompose(x); (cy, ky) <- decompose(y))
          yield merge(cx, cy, 1L) -> (kx + ky)
      case Subtract(x, y, _) =>
        for ((cx, kx) <- decompose(x); (cy, ky) <- decompose(y))
          yield merge(cx, cy, -1L) -> (kx - ky)
      case UnaryMinus(x, _) =>
        decompose(x).map { case (c, k) =>
          c.map { case (id, (a, coef)) => id -> (a, -coef) } -> -k
        }
      // widening cast only — narrowing would change comparison semantics
      case c: Cast if c.dataType == LongType && isIntegral(c.child.dataType) =>
        decompose(c.child)
      case _ => None
    }

  private def merge(
      a: Map[ExprId, (Attribute, Long)],
      b: Map[ExprId, (Attribute, Long)],
      sign: Long): Map[ExprId, (Attribute, Long)] =
    b.foldLeft(a) { case (acc, (id, (attr, coef))) =>
      val next = acc.get(id).map(_._2).getOrElse(0L) + sign * coef
      if (next == 0L) acc - id else acc + (id -> (attr, next))
    }

  /** Normalize one conjunct to a [[Band]] when it is a two-attribute
    * integral range bound crossing the join.
    */
  private def bandOf(
      c: Expression, left: LogicalPlan, right: LogicalPlan): Option[Band] = {
    val cmp = c match {
      case bc: BinaryComparison => bc
      case _                    => return None
    }
    val lin = for {
      (cl, kl) <- decompose(cmp.left)
      (cr, kr) <- decompose(cmp.right)
    } yield (merge(cl, cr, -1L), kl - kr) // lhs - rhs REL 0
    lin.flatMap { case (coefs, const) =>
      val attrs = coefs.values.toSeq
      val xOpt  = attrs.collectFirst { case (a, 1L) => a }
      val yOpt  = attrs.collectFirst { case (a, -1L) => a }
      (attrs.size, xOpt, yOpt) match {
        case (2, Some(x), Some(y)) =>
          // x - y + const REL 0  →  x - y REL -const (tighten strict by 1)
          val normalized = cmp match {
            case _: LessThan           => Some((-const - 1, true))
            case _: LessThanOrEqual    => Some((-const, true))
            case _: GreaterThan        => Some((-const + 1, false))
            case _: GreaterThanOrEqual => Some((-const, false))
            case _                     => None
          }
          normalized.flatMap { case (bound, upper) =>
            if (left.outputSet.contains(x) && right.outputSet.contains(y))
              Some(Band(x, y, bound, upper))
            else if (right.outputSet.contains(x) && left.outputSet.contains(y))
              // x - y <= B  ⇔  y - x >= -B (and dually)
              Some(Band(y, x, -bound, !upper))
            else None
          }
        case _ => None
      }
    }
  }

  private def hasCrossEquiKey(
      conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean = {
    def crossSides(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))
    conjuncts.exists {
      case EqualTo(a, b)       => crossSides(a, b)
      case EqualNullSafe(a, b) => crossSides(a, b)
      case _                   => false
    }
  }

  private def tryRewrite(
      l: LogicalPlan,
      r: LogicalPlan,
      cond: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // never re-fire on a join this rule already built (its bucket-id
    // conjunct would otherwise read as a fresh equi key in band-equi mode)
    if (conjuncts.exists(_.references.exists(_.name == "__graft_band"))) return None
    // With an equi key present Spark already hash-partitions; appending
    // the band bucket to the join key additionally bounds the per-key
    // candidate volume (a hot key's rows only meet neighbors within 2
    // band widths instead of its whole partition). That trades a 2×
    // right-side replication for skew resistance, so it is opt-in:
    // spark.graft.rangeJoinRewrite.bandEquiJoins=true.
    val equiMode = SQLConf.get
      .getConfString("spark.graft.rangeJoinRewrite.bandEquiJoins", "false") == "true"
    if (hasCrossEquiKey(conjuncts, l, r) && !equiMode) return None
    val equiConjs = conjuncts.filter(c => c match {
      case EqualTo(_, _) | EqualNullSafe(_, _) => hasCrossEquiKey(Seq(c), l, r)
      case _                                   => false
    })
    val bands = conjuncts.flatMap(bandOf(_, l, r))
    // pick the first attribute pair carrying both an upper and a lower bound
    val byPair = bands.groupBy(b => (b.la.exprId, b.rb.exprId))
    byPair.values.view
      .flatMap { bs =>
        val uppers = bs.filter(_.upper).map(_.bound)
        val lowers = bs.filterNot(_.upper).map(_.bound)
        for {
          u  <- if (uppers.isEmpty) None else Some(uppers.min)
          lo <- if (lowers.isEmpty) None else Some(lowers.max)
          if lo <= u && math.abs(u) < MaxBound && math.abs(lo) < MaxBound
        } yield (bs.head.la, bs.head.rb, lo, math.max(u - lo, 1L))
      }
      .headOption
      .map { case (la, rb, lo, w) =>
        // Bucket keys are the bucket BASE value (x − x mod w), computed
        // in DECIMAL(38,0): decimal arithmetic cannot overflow for ANY
        // long attribute (|x| + |lo| ≪ 10^38), where the former
        // long-space subtract/add threw under ANSI for values near the
        // ±2^63 boundary (e.g. xxhash64-derived keys). No division
        // anywhere — equal buckets ⇔ equal bases (Pmod keeps the
        // remainder non-negative, so the base IS the floor alignment
        // for negative x too), and the neighbor bucket is base + w.
        val dec = DecimalType(38, 0)
        def toDec(e: Expression): Expression = Cast(e, dec)
        val wDec = toDec(Literal(w))
        def bucketBase(x: Expression): Expression = {
          val xd = toDec(x)
          Cast(Subtract(xd, Pmod(xd, wDec)), dec)
        }

        val lBand     = Alias(bucketBase(la), "__graft_band")()
        val leftProj  = Project(l.output :+ lBand, l)
        val rBase     = bucketBase(Add(toDec(rb), toDec(Literal(lo))))
        val rBandAttr = AttributeReference("__graft_band", dec)()
        val gen = Generate(
          Explode(CreateArray(Seq(rBase, Cast(Add(rBase, wDec), dec)))),
          unrequiredChildIndex = Nil,
          outer = false,
          qualifier = None,
          generatorOutput = Seq(rBandAttr),
          child = r)
        val joinCond = (equiConjs :+ EqualTo(lBand.toAttribute, rBandAttr))
          .reduce[Expression](And)
        val banded = Join(leftProj, gen, Inner, Some(joinCond), hint)
        Project(l.output ++ r.output, Filter(cond, banded))
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = SQLConf.get
      .getConfString("spark.graft.rangeJoinRewrite.enabled", "true") == "true"
    if (!enabled) plan
    else
      plan.transformUp {
        case j @ Join(l, r, Inner | Cross, Some(cond), hint)
            if !l.isStreaming && !r.isStreaming =>
          tryRewrite(l, r, cond, hint).getOrElse(j)
      }
  }
}
