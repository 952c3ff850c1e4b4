package graft

import graft.operators.Engagement
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopK
import org.scalatest.funsuite.AnyFunSuite

/** The custom TopKPerKey operator must agree exactly with the window
  * formulation and must plan without a WindowExec/Sort.
  */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("custom operator output equals window row_number formulation") {
    val window = Engagement.userSessionsTopK(spark, TestSpark.Sf).collect()
    val custom = Engagement.userSessionsTopKCustom(spark, TestSpark.Sf).collect()
    assert(custom.toSeq === window.toSeq)
  }

  test("plan uses TopKPerKeyExec, not WindowExec") {
    val plan = Engagement
      .userSessionsTopKCustom(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Window"))
  }

  test("handles ties, k larger than group, empty input") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "a"), (1L, 10L, "b"), (1L, 5L, "c"),
      (2L, 7L, "d")).toDF("k", "o", "v")
    val got = TopK
      .perKey(df, Seq("k"), Seq("o" -> true, "v" -> true), 2)
      .orderBy(col("k"), col("rn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 5L, "c", 1L), (1L, 10L, "a", 2L), (2L, 7L, "d", 1L)))
    val empty = TopK.perKey(df.filter(col("k") > 99), Seq("k"), Seq("o" -> true), 3)
    assert(empty.count() === 0)
  }

  test("empty key set = global top-k: partial heap + single-partition final") {
    import spark.implicits._
    val df = spark.range(0, 1000, 1, 8)
      .select(col("id"), (lit(999L) - col("id")).as("o"))
    val got = TopK.perKey(df, Nil, Seq("o" -> true), 5)
      .orderBy(col("rn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // global smallest o = largest id: 999..995 with rank 1..5
    assert(got.toSeq === (0 until 5).map(i => (999L - i, i.toLong, (i + 1).toLong)))
    val plan = TopK.perKey(df, Nil, Seq("o" -> true), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTopK"), s"missing partial stage:\n$plan")
    assert(!plan.contains("Sort"), s"global top-k must be sort-free:\n$plan")
  }

  test("rank column is dense 1..min(k, group size)") {
    val counts = Engagement.userSessionsTopKCustom(spark, TestSpark.Sf)
      .groupBy("user_id").agg(max("rn").as("mx"), count(lit(1)).as("n"))
      .collect()
    counts.foreach(r => assert(r.getLong(1) === r.getLong(2)))
  }
}
