package graft

import graft.operators.Engagement
import org.scalatest.funsuite.AnyFunSuite

class EngagementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("segments partition the user set") {
    val df  = Engagement.engagementVsSpend(spark, TestSpark.Sf)
    val n   = df.count()
    val seg = Engagement.segmentCounts(spark, TestSpark.Sf).collect()
    assert(seg.map(_.getLong(1)).sum === n)
    val labels = seg.map(_.getString(0)).toSet
    assert(labels.subsetOf(Set(
      "HighEngagement-HighSpend", "HighEngagement-LowSpend",
      "LowEngagement-HighSpend", "LowEngagement-LowSpend")))
  }

  test("correlations are in [-1, 1]") {
    val r = Engagement.engagementSpendCorr(spark, TestSpark.Sf).collect().head
    val c1 = r.getDouble(1); val c2 = r.getDouble(2)
    assert(c1 >= -1.0 && c1 <= 1.0)
    assert(c2 >= -1.0 && c2 <= 1.0)
  }

  test("sessionize: session event counts sum to total events") {
    val sess  = Engagement.sessionize(spark, TestSpark.Sf)
    val total = sess.agg(org.apache.spark.sql.functions.sum("n_events")).collect().head.getLong(0)
    assert(total === Tables.events(spark, TestSpark.Sf).count())
  }

  test("sessionize: sessions never overlap within a user") {
    val rows = Engagement.sessionize(spark, TestSpark.Sf)
      .collect()
      .groupBy(_.getLong(0))
    rows.values.foreach { ss =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) < b.getLong(3)) // prev end < next start
        case _ =>
      }
    }
  }

  test("per-user top-5 never exceeds 5 rows per user") {
    val counts = Engagement.userSessionsTopK(spark, TestSpark.Sf)
      .groupBy("user_id").count().collect()
    assert(counts.forall(_.getLong(1) <= 5))
  }
}
