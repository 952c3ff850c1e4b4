package graft

import graft.operators.AsOf
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(
      lefts: Seq[(Long, Long, Long)],  // (pid, key, t)
      rights: Seq[(Long, Long, Long)]  // (vid, key, t)
  ) =
    AsOf.joinAsOf(
      lefts.toDF("pid", "k", "pt"),
      rights.toDF("vid", "rk", "vt"),
      leftKey = "k", rightKey = "rk", leftTime = "pt", rightTime = "vt")
      .orderBy($"pid")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))

  test("picks the latest right row at-or-before the left time") {
    val got = run(
      lefts = Seq((1L, 7L, 100L), (2L, 7L, 250L)),
      rights = Seq((10L, 7L, 50L), (11L, 7L, 100L), (12L, 7L, 200L), (13L, 7L, 300L)))
    // pid 1 at t=100 → vid 11 (equal timestamp counts); pid 2 → vid 12
    assert(got.toSeq === Seq((1L, Some(11L)), (2L, Some(12L))))
  }

  test("left rows with no prior right row get nulls") {
    val got = run(
      lefts = Seq((1L, 7L, 10L)),
      rights = Seq((10L, 7L, 50L)))
    assert(got.toSeq === Seq((1L, None)))
  }

  test("keys never mix") {
    val got = run(
      lefts = Seq((1L, 7L, 100L)),
      rights = Seq((10L, 8L, 50L)))
    assert(got.toSeq === Seq((1L, None)))
  }

  test("carry-forward spans many left rows after the last right row") {
    val got = run(
      lefts = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 300L)),
      rights = Seq((10L, 7L, 90L)))
    assert(got.toSeq === Seq((1L, Some(10L)), (2L, Some(10L)), (3L, Some(10L))))
  }
}
