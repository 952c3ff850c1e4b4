package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round10AdditionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dedup_containment: deciles well-formed, subset-missed bounded") {
    val rows = operators.Dedup.dedupContainment(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "the fixture corpus carries co-shingled pairs")
    rows.foreach { r =>
      val (dec, n, missed, mj) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dec >= 0 && dec <= 9, s"decile $dec out of range")
      assert(n > 0, "emitted deciles carry pairs")
      assert(missed <= n, "missed subset-dups bounded by pair count")
      assert(mj >= 0.0 && mj <= 1.0, s"mean jaccard $mj out of range")
      // a pair in a low-containment decile cannot be a subset dup
      if (dec < 8) assert(missed === 0L, s"decile $dec cannot hold cont>=0.8 pairs")
    }
    val deciles = rows.map(_.getLong(0))
    assert(deciles.sameElements(deciles.sorted), "output ordered by decile")
  }

  test("dedup_containment: a strict subset doc is caught that Jaccard misses") {
    // doc 2 begins with doc 1's full text: containment(1->2) = 1.0 while
    // jaccard = 3/10 — exactly the quoted-article shape the report exists
    // to count. Crafted corpus written as a real parquet dir so the query
    // runs its actual scan path.
    val dir = java.nio.file.Files.createTempDirectory("graft-containment").toString
    import spark.implicits._
    Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (3L, "x1 x2 x3 x4 x5 x6")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.dedupContainment(spark, dir).collect()
    // pair (1,2): cont_max 1.0 -> decile 9; jaccard 3/(3+10-3) = 0.3 < 0.6
    val d9 = rows.find(_.getLong(0) == 9L)
    assert(d9.isDefined, "the full-containment pair lands in decile 9")
    assert(d9.get.getLong(1) === 1L)
    assert(d9.get.getLong(2) === 1L, "the subset dup is counted as Jaccard-missed")
    assert(math.abs(d9.get.getDouble(3) - 0.3) < 1e-9)
    // doc 3 shares nothing — exactly one pair overall
    assert(rows.map(_.getLong(1)).sum === 1L)
  }

  test("eventsBetween: open-ended bounds survive the timestamp-typed encoding") {
    // timestamp_micros(Long.MaxValue) overflows in the Julian-rebase
    // literal conversion — an open delta bound must therefore DROP the
    // unrepresentable side, not materialize it (round-10 ledger find:
    // incremental_agg_merge failed at runtime on timestamp-typed events)
    val dir = java.nio.file.Files.createTempDirectory("graft-tsevents").toString
    import spark.implicits._
    Seq((1L, 100L), (2L, 200L), (3L, 300L))
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Tables.eventsBetween(spark, dir, Long.MinValue, Long.MaxValue).count() === 3L)
    assert(Tables.eventsBetween(spark, dir, 150L, Long.MaxValue).count() === 2L)
    assert(Tables.eventsBetween(spark, dir, Long.MinValue, 150L).count() === 1L)
  }

  test("embedding_outliers: per-cell ledger is conservation- and bound-correct") {
    val rows = operators.Similarity.embeddingOutliers(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.embeddings(spark, TestSpark.Sf).count()
    assert(rows.map(_.getLong(1)).sum === total, "every vector lands in one cell")
    rows.foreach { r =>
      val (n, out, mean, mx) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(out <= n, "outliers bounded by cell population")
      assert(mean >= 0.0, "squared distances are non-negative")
      assert(mx + 1e-6 >= mean, "max d2 at least the mean")
      // Chebyshev: at most 1/4 of a cell can sit beyond 2 sigma
      assert(out <= n / 4 + 1, s"2-sigma outliers exceed the Chebyshev bound: $out of $n")
    }
  }
}
