package graft

import graft.operators.{Dedup, Quality, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** The intentionally-quadratic exact anchors must never build their
  * quadratic plans on oversized corpora: above the cap they AUTO-ROUTE
  * to their bounded sketch twins with a logged downgrade (the 100 TB
  * caller degrades to approximate results instead of crashing), and at
  * the shipped caps the test-scale queries still run exact.
  */
class QuadraticGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dedup_jaccard above the cap routes to dedup_minhash, schema preserved") {
    Downgrades.last = None
    val routed = Dedup.dedupJaccardGuarded(spark, TestSpark.Sf, cap = 10)
    assert(Downgrades.last.exists(m =>
      m.contains("dedup_jaccard") && m.contains("dedup_minhash")))
    // schema contract holds so dedup_editdist/dedup_clusters still build
    assert(routed.columns.toSeq == Seq("doc_a", "doc_b", "common", "jaccard"))
    val twin = Dedup.dedupMinhash(spark, TestSpark.Sf)
    assert(
      routed.select("doc_a", "doc_b", "jaccard").collect().map(_.toSeq).toSeq ==
        twin.select("doc_a", "doc_b", "est_jaccard").collect().map(_.toSeq).toSeq)
  }

  test("over-budget pair mass routes the exact family even under the doc cap") {
    // The ×20 probe (100k docs, maximally duplicated) showed the doc cap
    // alone is not a spill guard: 556M expanded pairs → 162 GiB spill,
    // past the 128 GiB envelope. The second guard axis measures
    // Σ C(df,2) from the df histogram and routes when it exceeds
    // PairBudget (200M ≈ 60 GiB worst-case spill at the measured
    // ~0.3 KiB/pair).
    val mass = Dedup.exactPairMass(spark, TestSpark.Sf)
    assert(mass > 0L, "fixture must carry duplicated shingles")

    Downgrades.last = None
    val routed = Dedup.dedupJaccardGuarded(
      spark, TestSpark.Sf, cap = Long.MaxValue, pairBudget = 0L)
    assert(Downgrades.last.exists(m =>
      m.contains("dedup_jaccard") && m.contains("pair-mass")))
    val twin = Dedup.dedupMinhash(spark, TestSpark.Sf)
    assert(
      routed.select("doc_a", "doc_b", "jaccard").collect().map(_.toSeq).toSeq ==
        twin.select("doc_a", "doc_b", "est_jaccard").collect().map(_.toSeq).toSeq)

    // within budget the exact plan is untouched
    Downgrades.last = None
    Dedup.dedupJaccardGuarded(
      spark, TestSpark.Sf, cap = Long.MaxValue, pairBudget = Long.MaxValue).count()
    assert(Downgrades.last.isEmpty)

    // containment samples down by ceil(sqrt(mass/budget)) on the same axis
    Downgrades.last = None
    Dedup.dedupContainmentGuarded(
      spark, TestSpark.Sf, cap = Long.MaxValue, pairBudget = 0L).count()
    assert(Downgrades.last.exists(m =>
      m.contains("dedup_containment") && m.contains("pair-mass")))

    // the two containment axes COMBINE (m = max of both), they never
    // short-circuit: an above-cap corpus still gets the density check,
    // and the governing axis names itself in the downgrade
    val n = Tables.cachedCount(spark, TestSpark.Sf, "documents")
    val mCap = (n + 10 - 1) / 10
    val mMass = math.max(
      2L, math.ceil(math.sqrt(mass.toDouble / 1.0)).toLong)
    val expectM = math.max(mCap, mMass)
    Downgrades.last = None
    Dedup.dedupContainmentGuarded(
      spark, TestSpark.Sf, cap = 10, pairBudget = 1L).count()
    assert(Downgrades.last.exists(_.contains(s"1/$expectM doc-hash sample")),
      s"expected combined m=$expectM (cap axis $mCap, mass axis $mMass): ${Downgrades.last}")
    if (mMass > mCap)
      assert(Downgrades.last.exists(_.contains("pair-mass")))

    // keep-best routes to the minhash-star labels on the same axis
    Downgrades.last = None
    Dedup.dedupKeepBestContainmentGuarded(
      spark, TestSpark.Sf, cap = Long.MaxValue, pairBudget = 0L).count()
    assert(Downgrades.last.exists(_.contains("dedup_keep_best_containment")))
  }

  test("embedding_neardup above the cap routes to embedding_neardup_lsh") {
    Downgrades.last = None
    val routed = Similarity.embeddingNeardupGuarded(spark, TestSpark.Sf, cap = 10)
    assert(Downgrades.last.exists(m =>
      m.contains("embedding_neardup") && m.contains("embedding_neardup_lsh")))
    val twin = Similarity.embeddingNeardupLsh(spark, TestSpark.Sf)
    assert(
      routed.collect().map(_.toSeq).toSeq == twin.collect().map(_.toSeq).toSeq)
  }

  test("dedup_editdist verifies at most EditVerifyCap candidates per doc") {
    // the O(len^2) levenshtein stage must be budgeted: top-j by jaccard
    // (ties to the smaller doc_b) per doc_a, j = EditVerifyCap
    val full = Dedup.dedupEditdistCapped(spark, TestSpark.Sf, verifyCap = 1000)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val capped1 = Dedup.dedupEditdistCapped(spark, TestSpark.Sf, verifyCap = 1)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // cap respected
    assert(capped1.groupBy(_._1).values.map(_.size).max === 1)
    // and the survivor per doc is the STRONGEST candidate, not an
    // arbitrary one: max jaccard, ties to the smaller doc_b
    val expect = full.groupBy(_._1).values
      .map(_.minBy(t => (-t._3, t._2))).toSet
    assert(capped1.toSet === expect)
    // at the shipped cap the test corpus is untouched (max candidates
    // per doc is far below 8 — the sf hashes must not move)
    val shipped = Dedup.dedupEditdist(spark, TestSpark.Sf)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(shipped.toSet === full.toSet)
  }

  test("the exact family inherits the routing (editdist stays bounded)") {
    // dedup_editdist builds on dedupJaccard; with the cap tripped its
    // candidate set comes from the minhash twin — the plan must still
    // resolve (jaccard column present) and stay candidate-bounded.
    Downgrades.last = None
    val n = Tables.cachedCount(spark, TestSpark.Sf, "documents")
    assert(n > 10) // precondition: the tiny cap actually trips
    val df = Dedup.dedupJaccardGuarded(spark, TestSpark.Sf, cap = 10)
    assert(df.columns.contains("jaccard"))
    assert(Downgrades.last.nonEmpty)
  }

  test("orders_profile above the cap routes to the KMV-NDV plan, schema preserved") {
    Downgrades.last = None
    val exact  = Quality.ordersProfileGuarded(spark, TestSpark.Sf, cap = Long.MaxValue)
    assert(Downgrades.last.isEmpty)
    val routed = Quality.ordersProfileGuarded(spark, TestSpark.Sf, cap = 10)
    assert(Downgrades.last.exists(m =>
      m.contains("orders_profile") && m.contains("kmv-ndv")))
    // identical schema: downstream consumers never see the switch
    assert(routed.schema == exact.schema)
    // nulls/min/max stay exact; only n_distinct becomes an estimate
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    routed.collect().foreach { r =>
      val ex = e(r.getString(0))
      assert(r.get(2) == ex.get(2), s"${r.getString(0)} n_nulls must stay exact")
      assert(r.get(4) == ex.get(4) && r.get(5) == ex.get(5) &&
        r.get(6) == ex.get(6) && r.get(7) == ex.get(7),
        s"${r.getString(0)} min/max must stay exact")
      val nd  = r.getLong(3).toDouble
      val ndE = ex.getLong(3).toDouble
      assert(nd > ndE * 0.7 && nd < ndE * 1.3,
        s"${r.getString(0)} KMV ndv $nd vs exact $ndE out of tolerance")
    }
    // no Expand in the routed plan — the scale property the routing buys
    val plan = routed.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "routed profile must not plan an Expand")
  }

  test("lsh_band_sweep above the cap prices a deterministic doc sample") {
    Downgrades.last = None
    val routed = Dedup.lshBandSweepGuarded(spark, TestSpark.Sf, cap = 100)
    assert(Downgrades.last.exists(m =>
      m.contains("lsh_band_sweep") && m.contains("doc-hash sample")))
    val rows = routed.collect()
    // still one priced row per config, same schema, and the sampled
    // candidate volume is bounded by the full corpus's. The ≤ bound
    // assumes the fixture has NO bucket over the 100-doc cap (true
    // here — the unsampled run reports zero hot buckets): with every
    // full bucket inside the window, each sampled pair shares a full
    // bucket and so exists in the full expansion too. A fixture with
    // capped buckets would break the comparison for reasons unrelated
    // to the guard (full drops a bucket its sample keeps).
    assert(rows.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    val full = Dedup.lshBandSweepGuarded(spark, TestSpark.Sf, cap = Long.MaxValue)
      .collect()
    assert(full.forall(_.getLong(2) == 0L), "fixture precondition: no hot buckets")
    rows.zip(full).foreach { case (s, f) =>
      assert(s.getLong(3) <= f.getLong(3), "sampled candidates exceed full corpus")
      assert(s.getLong(4) <= f.getLong(4), "sampled verified exceed full corpus")
    }
  }

  test("minhash_k_curve above the cap grades a doc sample with a real exact anchor") {
    Downgrades.last = None
    val routed = Dedup.minhashKCurveGuarded(spark, TestSpark.Sf, cap = 100)
    assert(Downgrades.last.exists(m =>
      m.contains("minhash_k_curve") && m.contains("doc-hash sample")))
    val rows = routed.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(16L, 32L, 64L))
    // the fixture has no hot shingles, so the sampled corpus's exact
    // pairs are a subset of the full corpus's — counts can only shrink
    val full = Dedup.minhashKCurveGuarded(spark, TestSpark.Sf, cap = Long.MaxValue)
      .collect()
    rows.zip(full).foreach { case (s, f) =>
      assert(s.getLong(1) <= f.getLong(1), "sampled anchor exceeds full anchor")
      assert(s.getLong(4) <= f.getLong(4), "sampled flags exceed full flags")
    }
  }

  test("dedup_pair_quality above the cap grades a doc sample with a real exact anchor") {
    Downgrades.last = None
    val routed = Dedup.dedupPairQualityGuarded(spark, TestSpark.Sf, cap = 100)
    assert(Downgrades.last.exists(m =>
      m.contains("dedup_pair_quality") && m.contains("doc-hash sample")))
    val rows = routed.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("minhash", "simhash"))
    val full = Dedup.dedupPairQualityGuarded(spark, TestSpark.Sf, cap = Long.MaxValue)
      .collect()
    rows.zip(full).foreach { case (s, f) =>
      // no hot shingles on the fixture → the sampled corpus's pairs are
      // a subset of the full corpus's: counts can only shrink, and the
      // grading ratios must stay in [0, 1]
      assert(s.getLong(1) <= f.getLong(1), "sampled n_pairs exceeds full")
      assert(s.getLong(2) <= f.getLong(2), "sampled n_exact exceeds full")
      assert(s.getLong(3) <= s.getLong(1) && s.getLong(3) <= s.getLong(2),
        "n_hit bounded by both pair sets")
      Seq(4, 5).foreach { i =>
        assert(s.getDouble(i) >= 0.0 && s.getDouble(i) <= 1.0, s"ratio col $i in range")
      }
    }
  }

  test("at the shipped caps the anchors still run exact at test scale") {
    Downgrades.last = None
    assert(Dedup.dedupJaccard(spark, TestSpark.Sf).columns.nonEmpty)
    assert(Similarity.embeddingNeardup(spark, TestSpark.Sf).columns.nonEmpty)
    assert(Quality.ordersProfile(spark, TestSpark.Sf).columns.nonEmpty)
    assert(Downgrades.last.isEmpty) // no downgrade at test scale
  }
}
