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

  test("trailing summary line parses standalone and stays under 1 KB") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.lit
    val manyFailed: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("ok_tiny" -> ((s: org.apache.spark.sql.SparkSession, _: String) =>
        s.range(3).toDF("n").withColumn("c", lit(1)))) ++
        (1 to 40).map(i => s"broken_query_with_a_long_name_$i" ->
          ((_: org.apache.spark.sql.SparkSession, _: String) =>
            throw new IllegalStateException("boom")))
    val rep = Bench.runAll(spark, TestSpark.Sf, manyFailed)
    val line = rep.summaryJson
    // the driver captures the last ~2000 chars of output — the summary
    // must fit with room for sbt's epilogue even with dozens of failures
    assert(line.length < 1024, s"summary too long (${line.length}): $line")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText() === "summary")
    assert(node.get("n_ok").asInt() === 1)
    assert(node.get("n_failed").asInt() === 40)
    assert(node.get("failed").size() === 8) // capped list, exact count
    assert(node.get("failed_truncated").asBoolean())
    assert(node.get("total_s").asDouble() >= 0.0)
    // and in the healthy case there is no truncation marker
    val healthy = Bench.runAll(spark, TestSpark.Sf, manyFailed.take(1)).summaryJson
    val h = new com.fasterxml.jackson.databind.ObjectMapper().readTree(healthy)
    assert(h.get("n_failed").asInt() === 0 && h.get("failed_truncated") == null)
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
