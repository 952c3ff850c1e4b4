package graft

import graft.operators.{Olap, Rank, Retention}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OlapRetentionRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("revenue_cube: the ALL/ALL cell equals the sum of the one-dimension cells") {
    val rows = Olap.revenueCube(spark, TestSpark.Sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    val byStatus = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(byStatus.map(_.getLong(2)).sum === grand.head.getLong(2))
    val byPrio = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) != "ALL")
    assert(byPrio.map(_.getLong(2)).sum === grand.head.getLong(2))
  }

  test("order_size_histogram: shares sum to ~1 and counts sum to row count") {
    val rows = Olap.orderSizeHistogram(spark, TestSpark.Sf).collect()
    val total = Tables.orders(spark, TestSpark.Sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-6)
  }

  test("nation_balance_fulljoin preserves both sides (full outer)") {
    val out = Olap.nationBalanceFulljoin(spark, TestSpark.Sf)
    val nCust = Tables
      .customer(spark, TestSpark.Sf)
      .filter($"c_mktsegment" === "BUILDING")
      .select($"c_nationkey").distinct().count()
    val nSupp = Tables.supplier(spark, TestSpark.Sf).select($"s_nationkey").distinct().count()
    val n = out.count()
    assert(n >= math.max(nCust, nSupp))
    // zero-filled side rows exist iff the key sets differ
    assert(out.filter($"n_customers" === 0 || $"n_suppliers" === 0).count() ===
      n - out.filter($"n_customers" > 0 && $"n_suppliers" > 0).count())
  }

  test("buyers_with_sessions ⊆ buyers and ⊆ active users; disjoint from EXCEPT query") {
    val both = Olap.buyersWithSessions(spark, TestSpark.Sf)
    val without = graft.operators.Extended.customersWithoutSessions(spark, TestSpark.Sf)
    assert(both.intersect(without).count() === 0)
    val buyers = Tables.orders(spark, TestSpark.Sf).select($"o_custkey".as("user_id")).distinct()
    assert(both.count() + without.count() === buyers.count())
  }

  test("top_parts_per_brand: ranks 1..k per brand, revenue non-increasing within brand") {
    val rows = Olap.topPartsPerBrand(spark, TestSpark.Sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq === (1L to byRank.length).toSeq)
      val revs = byRank.map(_.getDouble(2)).toSeq
      assert(revs === revs.sorted.reverse)
    }
  }

  test("cohort_retention: offset-0 counts sum to the distinct customer count") {
    val rows = Retention.cohortRetention(spark, TestSpark.Sf).collect()
    val acquired = rows.filter(_.getInt(1) == 0).map(_.getLong(2)).sum
    val nCust = Tables.orders(spark, TestSpark.Sf).select($"o_custkey").distinct().count()
    assert(acquired === nCust)
    assert(rows.forall(_.getInt(1) >= 0))
  }

  test("order_gap_stats: gaps are non-negative and count = orders - customers") {
    val r = Retention.orderGapStats(spark, TestSpark.Sf).collect().head
    val orders = Tables.orders(spark, TestSpark.Sf).count()
    val cust = Tables.orders(spark, TestSpark.Sf).select($"o_custkey").distinct().count()
    assert(r.getLong(0) === orders - cust)
    assert(r.getDouble(1) >= 0 && r.getDouble(2) >= 0)
    assert(r.getDouble(3) >= r.getDouble(2)) // p90 >= median
  }

  test("spend_ntile: tile sizes differ by at most 1 and ranges are ordered") {
    val rows = graft.operators.Rank.spendNtile(spark, TestSpark.Sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length.toLong))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"ntile sizes must be balanced: ${sizes.toSeq}")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2) + 0.01)
      case _           =>
    }
  }

  test("distributed percent_rank matches the single-partition window exactly") {
    // spiky distribution with heavy ties to stress bucket boundaries
    val df = spark.range(10000)
      .select(($"id" % 57).cast("double").as("v"))
    val got = Rank
      .withGlobalRank(df, "v", buckets = 16)
      .select($"v", $"rank", $"pct_rank", $"cume_dist")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"v")
    val want = df.select(
      $"v",
      rank().over(w).cast("long").as("rank"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume_dist"))
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }
}
