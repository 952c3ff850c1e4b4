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

  test("embedding_pca_variance: spectrum well-formed on the fixture corpus") {
    val rows = operators.Similarity.embeddingPcaVariance(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val nVec = Tables.embeddings(spark, TestSpark.Sf).count()
    // one row per dimension, ranks sequential, every dim sees every vector
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length))
    assert(rows.map(_.getLong(1)).distinct.length === rows.length)
    rows.foreach(r => assert(r.getLong(2) === nVec))
    // variance non-increasing in rank order, shares conserve to 1
    val vars = rows.map(_.getDouble(4))
    assert(vars.zip(vars.tail).forall { case (a, b) => a + 1e-12 >= b })
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-3)
    val cums = rows.map(_.getDouble(6))
    assert(cums.zip(cums.tail).forall { case (a, b) => b + 1e-9 >= a }, "cum_share monotone")
    assert(math.abs(cums.last - 1.0) < 1e-4)
  }

  test("embedding_pca_variance: a collapsed encoder concentrates the spectrum") {
    // dim 2 carries all the variance; dims 1 and 3 are dead (constant).
    // The collapse diagnostic must rank dim 2 first with cum_share 1.0.
    val dir = java.nio.file.Files.createTempDirectory("graft-pca").toString
    import spark.implicits._
    Seq(
      (1L, Array(0.5f, -1.0f, 2.0f), 0),
      (2L, Array(0.5f, 1.0f, 2.0f), 0),
      (3L, Array(0.5f, 3.0f, 2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = operators.Similarity.embeddingPcaVariance(spark, dir).collect()
    assert(rows.length === 3)
    assert(rows.head.getLong(1) === 2L, "the live dimension ranks first")
    assert(math.abs(rows.head.getDouble(5) - 1.0) < 1e-6, "it owns all the variance")
    assert(math.abs(rows.head.getDouble(6) - 1.0) < 1e-6)
    rows.tail.foreach { r =>
      assert(math.abs(r.getDouble(4)) < 1e-9, s"dead dim ${r.getLong(1)} has zero variance")
    }
  }

  test("embedding_norm_profile: per-label stats well-formed; zero vector counted") {
    val rows = operators.Similarity.embeddingNormProfile(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val nVec = Tables.embeddings(spark, TestSpark.Sf).count()
    assert(rows.map(_.getLong(1)).sum === nVec, "labels partition the corpus")
    rows.foreach { r =>
      val (mean, v, mn, mx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9, "mean inside [min,max]")
      assert(v >= -1e-9, "variance non-negative")
      assert(r.getLong(6) >= 0L)
    }
    // drift audit on a crafted two-batch corpus: label 1 mis-scaled 10x,
    // label 2 contains a failed (all-zero) encode
    val dir = java.nio.file.Files.createTempDirectory("graft-norms").toString
    import spark.implicits._
    Seq(
      (1L, Array(3.0f, 4.0f), 1), (2L, Array(30.0f, 40.0f), 2),
      (3L, Array(0.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val byLabel = operators.Similarity.embeddingNormProfile(spark, dir)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(byLabel(1).getDouble(2) === 5.0)
    assert(byLabel(2).getDouble(5) === 50.0, "mis-scaled batch max norm 50")
    assert(byLabel(2).getLong(6) === 1L, "failed encode counted in n_zero")
  }

  test("corpus_concentration: gini/hhi exact on a hand-computed corpus") {
    val r0 = operators.Curation.corpusConcentration(spark, TestSpark.Sf).collect()
    assert(r0.length === 1)
    val gini = r0.head.getDouble(2)
    assert(gini >= 0.0 && gini <= 1.0)
    assert(r0.head.getDouble(3) >= 1.0 / r0.head.getLong(0), "hhi >= 1/n")
    assert(r0.head.getDouble(4) <= r0.head.getDouble(5) + 1e-12, "top1 <= top3")
    // hand corpus: token totals a=1, b=2, c=3, d=6 (12 total)
    //   gini = (2*(1*1+2*2+3*3+4*6) - 5*12) / (4*12) = (76-60)/48 = 1/3
    //   hhi  = (1+4+9+36)/144 = 50/144
    val dir = java.nio.file.Files.createTempDirectory("graft-conc").toString
    import spark.implicits._
    Seq(
      (1L, "t1", "a"), (2L, "t1 t2", "b"), (3L, "t1 t2 t3", "c"),
      (4L, "t1 t2 t3", "d"), (5L, "t1 t2 t3", "d")
    ).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.Curation.corpusConcentration(spark, dir).collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 12L)
    assert(math.abs(r.getDouble(2) - 1.0 / 3.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 50.0 / 144.0) < 1e-6)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-9, "top1 = 6/12")
    assert(math.abs(r.getDouble(5) - 11.0 / 12.0) < 1e-6, "top3 = (2+3+6)/12")
  }

  test("stream_funnel: micro-batched mergeable partials equal the batch funnel") {
    val streamed = streaming.EventStreams.streamFunnel(spark, TestSpark.Sf).collect()
    val batch = operators.Extended.conversionFunnel(spark, TestSpark.Sf).collect()
    assert(streamed.length === 1 && batch.length === 1)
    assert(streamed.head === batch.head,
      "any micro-batch partitioning must merge to the batch result")
    assert(batch.head.getLong(0) > 0, "fixture has users")
  }

  test("zipf_fit: exact fit on a crafted two-point spectrum; fixture slope negative") {
    val fx = operators.TextNgrams.zipfFit(spark, TestSpark.Sf).collect().head
    assert(fx.getLong(0) >= 2L && fx.getLong(0) <= 100L,
      "top slice bounded by min(vocab, 100)")
    assert(fx.getDouble(2) < 0.0, "natural-ish corpus has a falling spectrum")
    assert(fx.getDouble(4) > 0.0 && fx.getDouble(4) <= 1.0 + 1e-12)
    // crafted corpus: freq(a)=4, freq(b)=2 -> two points on an exact line
    //   slope = (ln2 - ln4) / (ln2 - ln1) = -1, intercept = ln4, r2 = 1
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    import spark.implicits._
    Seq((1L, "a a b"), (2L, "a a b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.TextNgrams.zipfFit(spark, dir).collect().head
    assert(r.getLong(0) === 2L)
    assert(r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - (-1.0)) < 1e-6, "slope exactly -1")
    assert(math.abs(r.getDouble(3) - math.log(4.0)) < 1e-6, "intercept ln 4")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-6, "perfect fit r2 = 1")
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
