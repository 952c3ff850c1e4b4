package graft

import graft.operators.{Sketches, Similarity, TextNgrams}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextNgramsSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigram_topk: counts positive, non-increasing, and words are alnum tokens") {
    val rows = TextNgrams.bigramTopK(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty && rows.length <= 40)
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts === counts.sorted.reverse)
    assert(rows.forall(r => r.getString(0).matches("[a-z0-9]+") && r.getString(1).matches("[a-z0-9]+")))
  }

  test("bpe_apply: token accounting is conserved and merges compress") {
    val rows = TextNgrams.bpeApply(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, chars, toks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // every word is at least one token; merging only ever shrinks the
      // char-level tokenization, never below one token per word
      assert(words >= 1 && toks >= words, s"doc ${r.getLong(0)}: $toks < $words")
      assert(toks <= chars, s"doc ${r.getLong(0)}: $toks > $chars")
    }
    // the 8 trained merges must actually fire somewhere in the corpus
    val (chars, toks) =
      rows.foldLeft((0L, 0L)) { case ((c, t), r) => (c + r.getLong(2), t + r.getLong(3)) }
    assert(toks < chars, "no merge applied anywhere — apply chain is dead")
  }

  test("tfidf_topk: 3 ranked terms per doc, tfidf non-increasing, df consistent") {
    val rows = TextNgrams.tfidfTopK(spark, TestSpark.Sf).collect()
    val nDocs = Tables.documents(spark, TestSpark.Sf).count()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to byRank.length).toSeq)
      val scores = byRank.map(_.getDouble(5)).toSeq
      assert(scores === scores.sorted.reverse)
    }
    // a term appearing in every doc has idf 0 → tfidf 0; never negative
    assert(rows.forall(_.getDouble(5) >= 0.0))
    assert(rows.forall(_.getLong(4) <= nDocs))
  }

  test("quality_filter: pass counts bounded by doc counts and rates consistent") {
    val rows = TextNgrams.qualityFilter(spark, TestSpark.Sf).collect()
    val total = Tables.documents(spark, TestSpark.Sf).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3) - r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
  }

  test("doc_len_percentiles: monotone percentiles within each language") {
    TextNgrams.docLenPercentiles(spark, TestSpark.Sf).collect().foreach { r =>
      val Seq(p25, p50, p75, p95) = Seq(2, 3, 4, 5).map(r.getDouble)
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
  }

  test("event_sliding_windows: each event counted in exactly width/slide windows") {
    val out = EventStreams.eventSlidingWindows(spark, TestSpark.Sf)
    val totalCounted = out.agg(sum($"n_events")).collect().head.getLong(0)
    val nEvents = Tables.events(spark, TestSpark.Sf).count()
    assert(totalCounted === 2 * nEvents)
  }

  test("contamination_check: scores in (0,1], corpus side only, benchmark docs self-match") {
    val rows = TextNgrams.contaminationCheck(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "fixture corpus contains planted near-dups of benchmark docs")
    rows.foreach { r =>
      assert(r.getLong(0) >= 20, "benchmark docs must not appear in the output")
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("distinct_users_sketch: KMV within 15% of exact; HLL++ likewise") {
    val rows = Sketches.distinctUsersSketch(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) <= 0.15, s"kmv err ${r.getDouble(3)}")
    }
    // HLL++ stays spec-covered here: its seed is engine-private, so it
    // can never be oracle-compared — the query carries the portable KMV.
    import org.apache.spark.sql.functions._
    val hll = Tables.events(spark, TestSpark.Sf)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("hll"))
      .collect()
    hll.foreach { r =>
      val err = math.abs(r.getLong(2).toDouble - r.getLong(1)) / r.getLong(1)
      assert(err <= 0.15, s"hll err $err for ${r.getString(0)}")
    }
  }

  test("embedding_neardup_lsh: recalls at least half of the brute-force top-10 pairs") {
    import graft.operators.Similarity
    def pairSet(df: org.apache.spark.sql.DataFrame, n: Int) =
      df.limit(n).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairSet(Similarity.embeddingNeardup(spark, TestSpark.Sf), 10)
    val lsh   = pairSet(Similarity.embeddingNeardupLsh(spark, TestSpark.Sf), 20)
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall $recall of brute top-10")
  }

  test("embedding_kmeans: partitions the corpus, inertia non-negative and improves on init") {
    val out = Similarity.embeddingKmeans(spark, TestSpark.Sf).collect()
    val n = Tables.embeddings(spark, TestSpark.Sf).count()
    assert(out.map(_.getLong(1)).sum === n)
    assert(out.forall(_.getDouble(2) >= 0.0))
    // determinism: a second run returns the identical frame
    val again = Similarity.embeddingKmeans(spark, TestSpark.Sf).collect()
    assert(out.toSeq === again.toSeq)
  }

  test("approx_percentile sketch honors its rank-error bound vs exact") {
    import org.apache.spark.sql.functions._
    // the quantile-sketch leg of the sketch tier: Spark's built-in
    // approx_percentile(accuracy a) guarantees rank error <= n/a; check
    // the guarantee against the exact percentile on event values
    val acc = 100
    val vals = Tables.events(spark, TestSpark.Sf)
      .select(col("value")).collect().map(_.getDouble(0)).sorted
    val n = vals.length
    val qs = Seq(0.25, 0.5, 0.9)
    val approx = Tables.events(spark, TestSpark.Sf)
      .agg(percentile_approx(col("value"),
        array(qs.map(lit): _*), lit(acc)).as("p"))
      .collect().head.getSeq[Double](0)
    qs.zip(approx).foreach { case (q, a) =>
      // rank of the sketch's answer must be within n/acc of q*n
      val rank = vals.count(_ <= a)
      val err  = math.abs(rank - q * n)
      assert(err <= n.toDouble / acc + 1,
        s"q=$q: sketch rank $rank vs ${q * n} exceeds n/acc=${n / acc}")
    }
  }

  test("KLL sketch: rank bound holds under any merge tree and skewed input") {
    import graft.functions.KllQuantiles
    val k   = 256
    val qs  = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val eps = 2.296 / math.pow(k.toDouble, 0.9)
    val rng = new scala.util.Random(7)
    // lognormal-ish skewed data: quantile sketches earn their keep where
    // the value distribution has a long tail
    val data = Array.fill(200000)(math.exp(rng.nextGaussian() * 2.0))
    val sorted = data.sorted

    def estimate(splits: Int): Seq[Double] = {
      val agg = new KllQuantiles(k, qs)
      val parts = data.grouped(math.max(1, data.length / splits)).map { chunk =>
        chunk.foldLeft(agg.zero)(agg.reduce)
      }
      agg.finish(parts.reduce(agg.merge))
    }

    // three very different merge trees: single partition, 32-way, 997-way
    Seq(1, 32, 997).foreach { splits =>
      val ests = estimate(splits)
      qs.zip(ests).foreach { case (q, v) =>
        val rank = sorted.count(_ <= v)
        val err  = math.abs(rank - q * data.length)
        assert(err <= eps * data.length + 1,
          f"splits=$splits q=$q: rank err $err%.0f > ${eps * data.length}%.0f")
      }
    }
    // sketch size stays O(k log(n/k)), nowhere near n
    val agg   = new KllQuantiles(k, qs)
    val state = data.foldLeft(agg.zero)(agg.reduce)
    val kept  = state.levels.map(_.size).sum
    assert(kept < 4 * k, s"sketch holds $kept items")
    assert(state.count === data.length)
  }

  test("value_quantiles_sketch: every row inside the published KLL bound") {
    val rows = graft.operators.Sketches
      .valueQuantilesSketch(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"bound violated: $r")
      assert(r.getDouble(2) >= 0.0) // event values are non-negative
    }
  }

  test("bpe_train: consecutive greedy merges; step 1 equals the top raw char pair") {
    val trace = graft.operators.TextNgrams.bpeTrain(spark, TestSpark.Sf).collect()
    assert(trace.nonEmpty)
    trace.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i + 1L, "steps must be consecutive from 1")
      assert(r.getString(3) === r.getString(1) + r.getString(2), "merged = left || right")
      assert(r.getLong(4) > 0L)
      assert(r.getString(3).matches("[a-z0-9]+"), "symbols stay alnum")
    }
    // cross-query: the first merge IS the most frequent adjacent char
    // pair, which bpe_pair_counts counts by the same overlap rules
    val top = graft.operators.TextNgrams.bpePairCounts(spark, TestSpark.Sf).head()
    val s1 = trace.head
    assert(s1.getString(3) === top.getString(0), "step-1 pair != top raw pair")
    assert(s1.getLong(4) === top.getLong(1), "step-1 count != top raw pair count")
  }
}
