package graft

import graft.operators.Commerce
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics from FIXTURES.md §4, on literal micro-frames. */
class CommerceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsOf(rows: Seq[(Long, Long)]) =
    // the production pair-expansion path, on a micro-fixture
    Commerce
      .pairCounts(rows.toDF("l_orderkey", "l_partkey"))
      .select($"part_x", $"part_y", $"pair_count")

  test("single-product order yields no pairs") {
    assert(pairsOf(Seq((1L, 10L))).count() === 0)
  }

  test("duplicate (order, product) line items collapse before pairing") {
    // order 1 has product 10 twice + product 20 once → exactly one pair
    val got = pairsOf(Seq((1L, 10L), (1L, 10L), (1L, 20L))).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((10L, 20L)))
  }

  test("pairs are canonical (x < y) and count C(n,2)") {
    val got = pairsOf(Seq((1L, 30L), (1L, 10L), (1L, 20L))).collect()
    assert(got.length === 3) // C(3,2)
    assert(got.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("mega-basket (5k items) expands without materializing C(n,2) in one row") {
    // 5000-item order → 12,497,500 pairs, streamed not buffered
    val rows = (1L to 5000L).map(p => (1L, p))
    val total = pairsOf(rows).agg(sum($"pair_count")).collect().head.getLong(0)
    assert(total === 5000L * 4999L / 2)
  }

  test("revenue_by_category keeps the null group for unmatched parts") {
    val li = Seq((1L, 999L, 10.0, 1.0, 0.0)).toDF(
      "l_orderkey", "l_partkey", "l_extendedprice", "l_quantity", "l_discount")
    val p = Seq((1L, "B1")).toDF("p_partkey", "p_brand")
    val out = li
      .join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"))
      .collect()
    assert(out.length === 1 && out.head.isNullAt(0))
  }

  test("top_spenders is deterministic and correctly ordered") {
    val a = Commerce.topSpenders(spark, TestSpark.Sf).collect()
    val b = Commerce.topSpenders(spark, TestSpark.Sf).collect()
    assert(a.toSeq === b.toSeq)
    val spends = a.map(_.getDouble(1)).toSeq
    assert(spends === spends.sorted.reverse)
  }

  test("revenue_by_day moving average window covers at most 7 days") {
    val rows = Commerce.revenueByDay(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    // first row: ma7 == revenue (frame of 1)
    assert(rows.head.getDouble(1) === rows.head.getDouble(3))
  }
}
