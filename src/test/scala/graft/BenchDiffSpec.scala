package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI guard for the round-over-round bench regression tool: runs
  * bench_diff.py's embedded selftest (regression threshold = factor x
  * AND absolute floor, improvement + added/removed reporting) and, when
  * local bench artifacts exist under bench/, diffs the most recent two
  * so a >2x per-query regression fails the suite instead of hiding in
  * BASELINE.md prose.
  */
class BenchDiffSpec extends AnyFunSuite {
  import scala.sys.process._

  test("a throwing query lands in failed[], not as a fake timing") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.lit
    val queries: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq(
        "ok_tiny" -> ((s, _) => s.range(10).toDF("n").withColumn("c", lit(1))),
        "broken"  -> ((_, _) => throw new IllegalStateException("deliberately broken")))
    val rep = Bench.runAll(spark, TestSpark.Sf, queries)
    assert(rep.ok.map(_.name) === Seq("ok_tiny"))
    assert(rep.failed.map(_._1) === Seq("broken"))
    assert(rep.failed.head._2.contains("deliberately broken"))
    // the JSON line must carry the verdict in its prefix and must not
    // contain a timing entry for the broken query
    val j = rep.json
    assert(j.indexOf("\"failed\":[\"broken\"]") >= 0 &&
      j.indexOf("\"failed\"") < j.indexOf("\"queries\""))
    assert(!j.contains("\"broken\":"))
    assert(j.contains("\"n_failed\":1"))
  }

  test("bench_diff selftest passes") {
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/bench_diff.py", "--selftest"))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code === 0, s"selftest failed:\n$out")
    assert(out.toString.contains("selftest ok"))
  }

  test("latest two local bench artifacts show no >2x per-query regression") {
    val dir = new java.io.File("bench")
    val arts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("BENCH_local_") && f.getName.endsWith(".json"))
      .sortBy(_.getName)
    assume(arts.length >= 2, "fewer than two bench artifacts retained yet")
    val Array(old, neu) = arts.takeRight(2).map(_.getPath)
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/bench_diff.py", old, neu))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code === 0, s"bench regression between $old and $neu:\n$out")
  }
}
