package graft

import graft.functions.FrequentItems
import graft.operators.{Rank, Retention, Sketches, TextNgrams}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrequentPrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("FrequentItems survives compression: all heavy keys found on skewed data") {
    // 200k rows: 50 hot keys (1000 each), 150k unique cold keys — far
    // over the 2k-entry cap for k=64... use k=256: cap 512 forces many
    // compressions; every key with freq > n/(k+1) ≈ 781 must survive.
    val k = 256
    val df = spark.range(200000)
      .select(
        when($"id" % 4 === 0, $"id" % 50)          // 50 hot keys, ~1000 each
          .otherwise($"id" + 1000000).as("key"))
    val mg = FrequentItems.udf(k)
    val cands = df.agg(mg($"key")).collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0)).toSet
    val bound = 200000.0 / (k + 1)
    val mustSurvive = df.groupBy($"key").count()
      .filter($"count" > bound)
      .collect().map(_.getLong(0))
    assert(mustSurvive.length >= 20, "fixture must actually contain heavy keys")
    mustSurvive.foreach { hot =>
      assert(cands.contains(hot), s"heavy key $hot missing from MG candidates")
    }
  }

  test("frequent_parts equals the exact groupBy+HAVING answer") {
    val got = Sketches.frequentParts(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val li = Tables.lineitem(spark, TestSpark.Sf)
    val thr = li.count() / 15000
    val want = li.groupBy($"l_partkey").count()
      .filter($"count" >= thr)
      .orderBy(desc("count"), asc("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("distributed prefix sum is bit-identical to the global window cumsum") {
    val df = spark.range(20000)
      .select($"id".as("k"), ($"id" % 37 + 1).as("v"))
    val got = Rank.withPrefixSum(df, "k", "v", buckets = 16)
      .select($"k", $"cum")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = df.select($"k", sum($"v").over(w).as("cum"))
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("doc_pack_bins: bins contiguous, token totals conserved, capacity respected") {
    val rows = TextNgrams.docPackBins(spark, TestSpark.Sf).collect()
    val bins = rows.map(_.getLong(0)).toSeq
    assert(bins === (bins.min to bins.max).toSeq, "bins must be contiguous")
    val totalTokens = Tables.documents(spark, TestSpark.Sf)
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(sum($"n")).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum === totalTokens)
    // chunked packing property: a bin holds < capacity + max_doc_tokens
    val maxDoc = Tables.documents(spark, TestSpark.Sf)
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(max($"n")).collect().head.getLong(0)
    assert(rows.forall(_.getLong(2) < 2048 + maxDoc))
    // doc ranges must not overlap across bins
    rows.sortBy(_.getLong(0)).sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3))
      case _           =>
    }
  }

  test("withGlobalRank edge cases: empty, single row, all-equal values") {
    val empty = spark.range(0).select($"id".cast("double").as("v"))
    assert(Rank.withGlobalRank(empty, "v").count() === 0)
    val single = spark.range(1).select(lit(7.0).as("v"))
    val s = Rank.withGlobalRank(single, "v").collect().head
    assert(s.getAs[Long]("rank") === 1L && s.getAs[Double]("pct_rank") === 0.0
      && s.getAs[Double]("cume_dist") === 1.0)
    val equal = spark.range(100).select(lit(3.5).as("v"))
    val rows = Rank.withGlobalRank(equal, "v", buckets = 8).collect()
    assert(rows.forall(_.getAs[Long]("rank") === 1L))
    assert(rows.forall(_.getAs[Double]("cume_dist") === 1.0))
  }

  test("withPrefixSum edge cases: empty and single-row frames") {
    val empty = spark.range(0).select($"id".as("k"), $"id".as("v"))
    assert(Rank.withPrefixSum(empty, "k", "v").count() === 0)
    val single = spark.range(1).select(lit(5L).as("k"), lit(9L).as("v"))
    assert(Rank.withPrefixSum(single, "k", "v").collect().head.getAs[Long]("cum") === 9L)
  }

  test("customer_order_span: growth = last - first, only multi-order customers") {
    val rows = Retention.customerOrderSpan(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 2)
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(1))) < 0.01)
    }
    val growths = rows.map(_.getDouble(4)).toSeq
    assert(growths === growths.sorted.reverse)
  }
}
