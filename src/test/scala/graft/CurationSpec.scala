package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curation tier proven on content the driver corpus cannot
  * exercise: real PII in the scrubber (the synthetic docs are word-only,
  * so the registered query's counts are structurally zero there), a
  * crafted repetitive-vs-diverse pair for the Gopher gates, and the
  * bounded-heap plan + determinism of the fixed-budget sampler.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("token_mix_plan: weights normalize, budget conserved, cap semantics hold") {
    val rows = Curation.tokenMixPlan(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    val totalAvail = rows.map(_._3).sum.toDouble
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-6, "mix weights must sum to 1")
    assert(math.abs(rows.map(_._5).sum - 4.0 * totalAvail) < 1.0,
      "targets must sum to the 4x-corpus budget")
    rows.foreach { case (src, nDocs, avail, w, target, epochs, planned, shortfall) =>
      assert(nDocs > 0 && avail >= nDocs, s"$src: degenerate counts")
      assert(w > 0 && w < 1, s"$src: weight $w out of range")
      assert(epochs > 0 && epochs <= 8.0, s"$src: epochs $epochs breaks the cap")
      assert(math.abs(planned - epochs * avail) < 0.5, s"$src: planned != epochs*avail")
      assert(math.abs(shortfall - math.max(0.0, target - planned)) < 0.5,
        s"$src: shortfall inconsistent")
      if (epochs < 8.0 - 1e-9)
        assert(shortfall < 0.5, s"$src: shortfall with slack epochs")
    }
  }

  test("source_overlap: canonical pair order, jaccard in (0,1], shared bounded by sets") {
    val rows = Curation.sourceOverlap(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "no overlapping source pairs found")
    rows.foreach { r =>
      val (a, b, shared, j) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(shared >= 1)
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j for ($a,$b)")
    }
  }

  test("source_overlap: corpus scans once — consumers read the checkpointed shingle frame") {
    // the distinct (source, h) frame feeds four plan branches; without
    // the localCheckpoint each re-derives the documents scan + explode
    // (4 FileScans in the initial plan, ≥2 even after AQE stage reuse).
    // Red here = the checkpoint was dropped and the corpus scan
    // multiplied again.
    import org.apache.spark.sql.classic.{Dataset => CDataset}
    import org.apache.spark.sql.Row
    val p = Curation.sourceOverlap(spark, TestSpark.Sf)
      .asInstanceOf[CDataset[Row]].queryExecution.executedPlan.toString
    assert(!p.contains("FileScan parquet"),
      s"source_overlap consumers re-scan the corpus:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"expected checkpointed shingle leaves in plan:\n$p")
  }

  test("quality_adaptive_gate: z-score thresholds are internally consistent and Chebyshev-bounded") {
    val rows = Curation.qualityAdaptiveGate(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mean, sd, thr, nDrop, rate) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getDouble(6))
      assert(sd >= 0.0)
      assert(math.abs(thr - (mean - sd)) < 2e-6, s"threshold != mean - sd for ${r.getString(0)}")
      assert(nDrop >= 0 && nDrop <= n)
      // one-sided Chebyshev: P(X < mean - 1*sd) <= 1/(1+1) = 0.5
      assert(rate <= 0.5 + 1e-9, s"drop_rate $rate violates the Chebyshev bound")
      assert(math.abs(rate - nDrop.toDouble / n) < 2e-6)
    }
  }

  test("pii scrub redacts emails, urls, digit runs — in that order") {
    import spark.implicits._
    val df = Seq(
      (1L, "web", "contact bob.smith+spam@ex-ample.org or visit https://x.io/a?id=1234567 room 42"),
      (2L, "web", "card 4111111122223333 and 555 are here"),
      (3L, "web", "clean text only"),
      // counter and redaction must see the SAME pattern: 'a@bcdef' has
      // no dot-TLD, so it is neither counted nor redacted (a parser
      // that unescapes '\\.' to '.' would count it but not redact it)
      (4L, "web", "ping a@bcdef about it"))
      .toDF("doc_id", "source", "text")
    val out = Curation.scrubText(df)
      .select("doc_id", "n_emails", "n_urls", "n_digit_runs", "scrubbed")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 1L, "one email")
    assert(out(1L).getLong(2) === 1L, "one url")
    // the url's 1234567 was already redacted inside <URL>; 42 is short
    assert(out(1L).getLong(3) === 0L, "no digit runs survive the url scrub")
    assert(out(1L).getString(4) === "contact <EMAIL> or visit <URL> room 42")
    assert(out(2L).getLong(3) === 1L, "16-digit card is one run; 555 too short")
    assert(out(2L).getString(4) === "card <NUM> and 555 are here")
    assert(out(3L).getString(4) === "clean text only")
    assert(out(4L).getLong(1) === 0L, "dot-less address must not count")
    assert(out(4L).getString(4) === "ping a@bcdef about it")
  }

  test("repetition gates separate a looped doc from diverse text") {
    import spark.implicits._
    val df = Seq(
      (1L, ("buy now " * 30).trim),                     // 50% top token, 49% top bigram
      (2L, "each word appears exactly once in this perfectly diverse sentence"))
      .toDF("doc_id", "text")
    val out = Curation.docRepetition(spark, writeDocs(df))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("repetitive"))
    assert(out(1L).getAs[Double]("top_token_share") === 0.5)
    assert(!out(2L).getAs[Boolean]("repetitive"))
    assert(out(2L).getAs[Double]("distinct_ratio") === 1.0)
  }

  test("per-lang sample is deterministic, k-bounded, and heap-planned") {
    val a = Curation.samplePerLang(spark, TestSpark.Sf).collect()
    val b = Curation.samplePerLang(spark, TestSpark.Sf).collect()
    assert(a.sameElements(b), "hash-seeded sample must be reproducible")
    val perLang = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    perLang.foreach { case (l, n) => assert(n <= 20, s"lang $l over budget") }
    // WindowTopKRewrite must lower the row_number<=k window to the
    // bounded-heap operator — no full per-stratum sort at scale
    val plan = Curation.samplePerLang(spark, TestSpark.Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKey in:\n$plan")
  }

  /** Write a (doc_id, text) frame as a documents.parquet-shaped dir. */
  private def writeDocs(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-curation").toFile
    dir.deleteOnExit()
    df.withColumn("lang", lit("en"))
      .withColumn("source", lit("fixture"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite")
      .parquet(dir.getAbsolutePath + "/documents.parquet")
    dir.getAbsolutePath
  }
}
