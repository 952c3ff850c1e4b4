package graft

import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WindowTopKRewrite optimizer rule: row_number-over-partition
  * filtered to <= k must plan as TopKPerKeyExec (no sort), with results
  * identical to the window semantics; ineligible shapes must be left
  * alone.
  */
class WindowTopKRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.asInstanceOf[CDataset[Row]].queryExecution.executedPlan

  private def usesTopK(df: org.apache.spark.sql.DataFrame): Boolean =
    executedPlan(df).toString.contains("TopKPerKey")

  private def base = Tables
    .events(spark, TestSpark.Sf)
    .select($"user_id", $"ts", $"event_id")

  test("row_number <= k rewrites to TopKPerKeyExec and keeps window results") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val df = base
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 4)
    assert(usesTopK(df), s"expected TopKPerKeyExec in:\n${executedPlan(df)}")
    // reference result computed with the rule inert (rank() variant is
    // not rewritten, and equals row_number under a total order)
    val ref = base
      .withColumn("rn", rank().over(w))
      .filter($"rn" <= 4)
    assert(df.exceptAll(ref).isEmpty && ref.exceptAll(df).isEmpty)
    assert(df.count() > 0)
  }

  test("strict < literal also rewrites, with k-1 semantics") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val lt = base.withColumn("rn", row_number().over(w)).filter($"rn" < 3)
    val le = base.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
    assert(usesTopK(lt))
    assert(lt.exceptAll(le).isEmpty && le.exceptAll(lt).isEmpty)
  }

  test("ineligible shapes are not rewritten: rank(), rank-only conjunct") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val rankDf = base.withColumn("rn", rank().over(w)).filter($"rn" <= 4)
    assert(!usesTopK(rankDf))
    // a conjunct entirely on rn cannot be split below the window and is
    // not the bare comparison shape — must stay on the window path
    val rnConj = base
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 4 && $"rn" % 2 === 1)
    assert(!usesTopK(rnConj))
  }

  test("global (empty-partition) row_number <= k rewrites: partial heap + k·p final") {
    val gw = Window.orderBy($"ts", $"event_id")
    val df = base
      .withColumn("rn", row_number().over(gw))
      .filter($"rn" <= 7)
    val plan = executedPlan(df)
    assert(plan.toString.contains("TopKPerKey"),
      s"global top-k-with-rank not rewritten:\n$plan")
    assert(plan.toString.contains("LocalTopK"),
      s"global rewrite missing the per-partition partial heap:\n$plan")
    // and no sort anywhere — the whole point of the rewrite
    assert(!plan.toString.contains("Sort "), s"unexpected sort in:\n$plan")
    val ref = base
      .withColumn("rn", rank().over(gw))
      .filter($"rn" <= 7)
    assert(df.exceptAll(ref).isEmpty && ref.exceptAll(df).isEmpty)
    assert(df.count() === 7)
  }

  test("registered query vocab_topk plans onto TopKPerKey with empty key") {
    val df = graft.operators.TextNgrams.vocabTopk(spark, TestSpark.Sf)
    val plan = executedPlan(df)
    assert(plan.toString.contains("TopKPerKey"),
      s"vocab_topk should run on the custom operator:\n$plan")
    assert(plan.toString.contains("LocalTopK"),
      s"vocab_topk missing the partial-heap stage:\n$plan")
  }

  test("pushable conjunct: predicate splits below the window, then the rewrite fires") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val conj = base
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 4 && $"user_id" > 2)
    // PushDownPredicates moves user_id > 2 below the window (it's a
    // partition-key predicate), leaving the bare rn filter → rewritten
    assert(usesTopK(conj))
    val ref = base
      .filter($"user_id" > 2)
      .withColumn("rn", rank().over(w))
      .filter($"rn" <= 4)
    assert(conj.exceptAll(ref).isEmpty && ref.exceptAll(conj).isEmpty)
    assert(conj.count() > 0)
  }

  test("pass-through projection between filter and window still rewrites") {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val df = base
      .withColumn("rn", row_number().over(w))
      .select($"rn", $"user_id", $"event_id") // attribute-only reorder
      .filter($"rn" <= 3)
    assert(usesTopK(df), s"projected shape not rewritten:\n${executedPlan(df)}")
    val ref = base
      .withColumn("rn", rank().over(w))
      .select($"rn", $"user_id", $"event_id")
      .filter($"rn" <= 3)
    assert(df.exceptAll(ref).isEmpty && ref.exceptAll(df).isEmpty)
  }

  test("registered window query user_sessions_topk now runs on the custom operator") {
    val df = graft.operators.Engagement.userSessionsTopK(spark, TestSpark.Sf)
    assert(usesTopK(df), "user_sessions_topk should be rewritten by the rule")
  }
}
