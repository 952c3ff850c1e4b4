package graft

import graft.operators.Temporal
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal tier: the bin-bucketed interval-overlap join must (a) plan as
  * a hash join, never a nested loop, and (b) produce exactly the rows the
  * naive non-equi join produces; ts_anomaly's output must respect its own
  * gate. Value-level correctness vs DuckDB is the driver oracle's job —
  * these specs pin the plan shape and the rewrite's semantics-preservation.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def physical(df: DataFrame): String =
    df.asInstanceOf[CDataset[Row]].queryExecution.executedPlan.toString

  test("interval_join plans as a hash join on the bin key, not a nested loop") {
    val p = physical(SparkEntry.queries("interval_join")(spark, TestSpark.Sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval overlap join degraded to nested-loop:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"bin-bucketed join lost its broadcast hash form:\n$p")
  }

  test("interval_join equals the naive non-equi overlap join") {
    val sess = Temporal.sessionIntervals(spark, TestSpark.Sf)
    val hot  = Temporal.incidentWindows(spark, TestSpark.Sf)
    val naive = sess
      .join(hot, col("s_start") < col("w_hi") && col("s_end") >= col("w_lo"))
      .select(
        col("user_id"), col("s_start"), col("s_end"), col("n_events"),
        (least(col("s_end") + 1, col("w_hi")) -
          greatest(col("s_start"), col("w_lo"))).as("ov"))
      .groupBy(col("user_id"), col("s_start"), col("s_end"), col("n_events"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(col("ov")).cast("long").as("total_overlap_us"))
      .orderBy(col("user_id"), col("s_start"))
      .collect()
      .toSeq
    val binned =
      SparkEntry.queries("interval_join")(spark, TestSpark.Sf).collect().toSeq
    assert(binned.nonEmpty, "interval_join returned no rows at sf0.001")
    assert(binned == naive,
      s"bin-bucketed join diverged from the naive overlap join " +
        s"(${binned.size} vs ${naive.size} rows)")
  }

  test("interval_join overlap accounting is internally consistent") {
    val rows = SparkEntry.queries("interval_join")(spark, TestSpark.Sf).collect()
    rows.foreach { r =>
      val sStart = r.getLong(r.fieldIndex("s_start"))
      val sEnd   = r.getLong(r.fieldIndex("s_end"))
      val nw     = r.getLong(r.fieldIndex("n_windows"))
      val ov     = r.getLong(r.fieldIndex("total_overlap_us"))
      assert(nw >= 1 && ov >= nw, s"degenerate overlap row: $r")
      // each window overlap is capped by the session's closed length
      assert(ov <= (sEnd - sStart + 1) * nw, s"overlap exceeds session span: $r")
    }
  }

  test("stream_ts_anomaly equals the batch scan row-for-row") {
    val stream =
      SparkEntry.queries("stream_ts_anomaly")(spark, TestSpark.Sf).collect().toSeq
    val batch =
      SparkEntry.queries("ts_anomaly")(spark, TestSpark.Sf).collect().toSeq
    assert(stream.nonEmpty, "streaming twin produced no rows at sf0.001")
    assert(stream == batch,
      s"merged streaming partials diverge from the batch aggregate " +
        s"(${stream.size} vs ${batch.size} rows)")
  }

  test("ts_anomaly emits only |z| >= 2.5 rows and joins hash-wise") {
    val df = SparkEntry.queries("ts_anomaly")(spark, TestSpark.Sf)
    val p  = physical(df)
    // the hours×types grid build may legitimately nested-loop (both sides
    // wall-clock-bounded); the data-keyed joins must be hash joins
    assert(!p.contains("CartesianProduct"), s"ts_anomaly cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"baseline join not hash:\n$p")
    val rows = df.collect()
    rows.foreach { r =>
      val z = r.getDouble(r.fieldIndex("z"))
      assert(math.abs(z) >= 2.5 - 1e-9, s"row under the anomaly gate: $r")
    }
  }
}
