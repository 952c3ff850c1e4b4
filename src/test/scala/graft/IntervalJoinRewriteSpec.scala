package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IntervalJoinRewrite: a declarative interval-overlap theta join must
  * become a binned equi-join with exactly-once emission (no nested loop,
  * no dedup) whose results are MULTISET-identical to the naive plan —
  * across strict/inclusive bounds, ± constant shifts, negative domains,
  * point-in-interval degeneracy, duplicate input rows, and malformed
  * (hi < lo) intervals. Equi-keyed joins and pure band joins must be
  * left to Spark / RangeJoinRewrite.
  */
class IntervalJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Flag  = "spark.graft.intervalJoinRewrite.enabled"
  private val Width = "spark.graft.intervalJoinRewrite.binWidth"

  private def physical(df: DataFrame): String =
    df.asInstanceOf[CDataset[Row]].queryExecution.executedPlan.toString

  private def withWidth[T](w: Long)(body: => T): T = {
    spark.conf.set(Width, w.toString)
    try body
    finally spark.conf.unset(Width)
  }

  private def withRuleOff[T](body: => T): T = {
    spark.conf.set(Flag, "false")
    try body
    finally spark.conf.set(Flag, "true")
  }

  /** maxBinsPerRow=0 drops the outlier-fallback branches — the lean
    * single-branch plan the no-nested-loop assertions check.
    */
  private def withNoFallback[T](body: => T): T = {
    spark.conf.set("spark.graft.intervalJoinRewrite.maxBinsPerRow", "0")
    try body
    finally spark.conf.unset("spark.graft.intervalJoinRewrite.maxBinsPerRow")
  }

  private def multiset(df: DataFrame): Map[Row, Int] =
    df.collect().toSeq.groupBy(identity).view.mapValues(_.size).toMap

  /** Rewritten and naive plans must agree as multisets. */
  private def sameResults(build: => DataFrame): Unit = {
    val on  = multiset(build)
    val off = withRuleOff(multiset(build))
    assert(on == off,
      s"binned results differ from nested-loop results (${on.size} vs ${off.size} distinct rows)")
  }

  // intervals with varied lengths, duplicates, and a malformed row
  private def la: DataFrame = Seq(
    (1L, 0L, 10L), (2L, 5L, 5L), (3L, 90L, 140L), (4L, -30L, -10L),
    (5L, 7L, 9L), (5L, 7L, 9L), // duplicate row — must appear twice per match
    (6L, 50L, 40L)              // malformed hi < lo
  ).toDF("a_id", "a_lo", "a_hi")

  private def rb: DataFrame = Seq(
    (10L, 8L, 12L), (11L, -20L, -15L), (12L, 100L, 100L), (13L, 39L, 51L),
    (14L, 5L, 7L), (15L, 200L, 300L)
  ).toDF("b_id", "b_lo", "b_hi")

  test("overlap join is rewritten: binned equi join, no nested loop") {
    withWidth(16L) {
      // default plan: binned main branch + (empty) outlier fallback
      val dflt = physical(
        la.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi")))
      assert(dflt.contains("__graft_bin"), s"bin key missing from plan:\n$dflt")
      // with the fallback disabled the plan must be purely binned
      withNoFallback {
        val q = la.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        val p = physical(q)
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"interval join still nested-loop:\n$p")
        assert(p.contains("__graft_bin"), s"bin key missing from plan:\n$p")
      }
      val naive = withRuleOff(physical(
        la.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))))
      assert(naive.contains("BroadcastNestedLoopJoin"),
        s"disabled-rule baseline should be the nested-loop plan:\n$naive")
    }
  }

  test("results are multiset-identical to the naive plan (inclusive bounds)") {
    withWidth(16L) {
      sameResults(
        la.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi")))
    }
  }

  test("strict bounds, reversed operand order") {
    withWidth(8L) {
      sameResults(
        la.join(rb, col("b_hi") > col("a_lo") && col("a_hi") >= col("b_lo")))
    }
  }

  test("constant shifts on either side") {
    withWidth(8L) {
      sameResults(
        la.join(rb,
          col("a_lo") <= col("b_hi") + 3 && col("b_lo") - 2 <= col("a_hi")))
    }
  }

  test("point-in-interval degenerate shape") {
    withWidth(8L) {
      val pts = Seq(1L, 5L, 8L, 40L, 100L, -17L).toDF("p")
      sameResults(
        pts.join(rb, col("b_lo") <= col("p") && col("p") <= col("b_hi")))
    }
  }

  test("width 1 and large width both agree with the naive plan") {
    Seq(1L, 1000L).foreach { w =>
      withWidth(w) {
        sameResults(
          la.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi")))
      }
    }
  }

  test("duplicate left rows stay distinct matches") {
    withWidth(16L) {
      val cnt = la
        .filter(col("a_id") === 5L)
        .join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .count()
      val naive = withRuleOff(
        la.filter(col("a_id") === 5L)
          .join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
          .count())
      assert(cnt === naive && cnt % 2 === 0,
        s"duplicated row must double its matches: binned $cnt naive $naive")
    }
  }

  test("mixed int/long endpoint widths rewrite and agree with the naive plan") {
    withWidth(8L) {
      // analyzer widening casts are stripped by decompose — the rule must
      // re-cast before Greatest or the generated plan is invalid
      val ints  = Seq((1, 0, 10), (2, 5, 9), (3, -9, -2)).toDF("i_id", "i_lo", "i_hi")
      val longs = rb
      val q = ints.join(longs,
        col("i_lo").cast("long") <= col("b_hi") && col("b_lo") <= col("i_hi").cast("long"))
      assert(physical(q).contains("__graft_bin"),
        s"mixed-width overlap join not rewritten:\n${physical(q)}")
      sameResults(
        ints.join(longs,
          col("i_lo").cast("long") <= col("b_hi") && col("b_lo") <= col("i_hi").cast("long")))
    }
  }

  test("outlier intervals exceeding maxBinsPerRow fall back per-row, results exact") {
    withWidth(4L) {
      spark.conf.set("spark.graft.intervalJoinRewrite.maxBinsPerRow", "3")
      try {
        // (90,140) spans 13 bins > cap — must route through the nested
        // fallback branch; small intervals stay binned. Results must
        // stay multiset-exact across the 3-branch union.
        val wide = la.union(Seq((7L, -1000L, 1000L)).toDF("a_id", "a_lo", "a_hi"))
        sameResults(
          wide.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi")))
        // saturating-widen hazard: an endpoint near Long.MaxValue used
        // to widen the bin range to Long.MaxValue and materialize an
        // astronomically long Sequence — now it must fall back, not die
        val sat = Seq((8L, Long.MaxValue - 5, Long.MaxValue))
          .toDF("a_id", "a_lo", "a_hi")
        sameResults(
          sat.join(rb, col("a_lo") <= col("b_hi") + 3 && col("b_lo") <= col("a_hi")))
      } finally spark.conf.unset("spark.graft.intervalJoinRewrite.maxBinsPerRow")
    }
  }

  test("null endpoints are pruned early and results agree with the naive plan") {
    withWidth(8L) {
      val nl = Seq(
        (1L, Option(0L), Option(10L)),
        (2L, Option.empty[Long], Option(5L)),
        (3L, Option(2L), Option.empty[Long]),
        (4L, Option.empty[Long], Option.empty[Long])
      ).toDF("a_id", "a_lo", "a_hi")
      val q = nl.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      assert(physical(q).contains("__graft_bin"))
      sameResults(
        nl.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi")))
    }
  }

  test("no width conf -> rule inert") {
    val p = physical(
      la.join(rb, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi")))
    assert(!p.contains("__graft_bin"), s"rule fired without a bin width:\n$p")
  }

  test("equi-keyed join untouched; pure band left to RangeJoinRewrite") {
    withWidth(16L) {
      val pe = physical(
        la.join(rb,
          col("a_id") === col("b_id") &&
            col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi")))
      assert(!pe.contains("__graft_bin"), s"fired despite an equi key:\n$pe")
      val xs = Seq(1L, 2L, 30L).toDF("x")
      val ys = Seq(2L, 3L, 31L).toDF("y")
      val pb = physical(
        xs.join(ys, col("y") > col("x") && col("y") - col("x") <= 5))
      assert(pb.contains("__graft_band") && !pb.contains("__graft_bin"),
        s"pure band must stay with RangeJoinRewrite:\n$pb")
    }
  }

  test("rewritten sessions×windows matches Temporal's hand-binned operator") {
    withWidth(3600000000L) { withNoFallback {
      val sess = graft.operators.Temporal.sessionIntervals(spark, TestSpark.Sf)
      val hot  = graft.operators.Temporal.incidentWindows(spark, TestSpark.Sf)
      val auto = sess
        .join(hot, col("s_start") < col("w_hi") && col("w_lo") <= col("s_end"))
      val p = physical(auto)
      assert(p.contains("__graft_bin") && !p.contains("BroadcastNestedLoopJoin"),
        s"declarative session×window join not auto-binned:\n$p")
      val agg = auto
        .groupBy(col("user_id"), col("s_start"), col("s_end"), col("n_events"))
        .agg(count(lit(1)).as("n_windows"))
        .orderBy(col("user_id"), col("s_start"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
        .toSeq
      val manual = SparkEntry.queries("interval_join")(spark, TestSpark.Sf)
        .collect()
        .map(r => (r.getLong(r.fieldIndex("user_id")),
          r.getLong(r.fieldIndex("s_start")),
          r.getLong(r.fieldIndex("n_windows"))))
        .toSeq
      assert(agg == manual, "auto-rewritten join disagrees with the operator")
    } }
  }
}
