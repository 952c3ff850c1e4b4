package graft

import graft.operators.{Commerce, Dedup, Graph}
import graft.sources.StatsManifest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: the fixed-round k-core peel, the sketch-vs-exact
  * dedup pair grading, and the small-file compaction plan. Oracle hashes
  * are covered by the driver gate; these specs prove the semantics the
  * hash can't see — the peel fixpoint, grading bounds, and the packing
  * invariants of the plan.
  */
class Round9AdditionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("k_core: every survivor's in-core degree meets the floor (peel converged)") {
    val rows = Graph.kCore(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "fixture co-purchase graph has a 3-core")
    // final degrees are computed AFTER the last filter, so a node under
    // the floor here would mean the fixed round count did NOT reach the
    // peel fixpoint on the fixture — the scaladoc's convergence claim
    rows.foreach { r =>
      assert(r.getLong(1) >= 3L, s"part ${r.getLong(0)} in core with degree ${r.getLong(1)}")
    }
  }

  test("k_core: survivors are a subset of nodes with full-graph degree >= floor") {
    val core = Graph.kCore(spark, TestSpark.Sf)
    val pairs = Commerce
      .pairCounts(
        Tables.lineitem(spark, TestSpark.Sf).select(col("l_orderkey"), col("l_partkey")))
      .filter(col("pair_count") >= 2)
    val fullDeg = pairs.select(col("part_x").as("n"))
      .unionAll(pairs.select(col("part_y").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val joined = core.join(fullDeg, core("l_partkey") === fullDeg("n"), "left")
    assert(joined.filter(col("d").isNull || col("d") < 3).isEmpty,
      "a core node must have had degree >= floor in the full graph")
    // peeling only removes: the core's degree never exceeds the full degree
    assert(joined.filter(col("core_degree") > col("d")).isEmpty)
  }

  test("dedup_pair_quality: counting identities and grading bounds hold") {
    val rows = Dedup.dedupPairQuality(spark, TestSpark.Sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("minhash", "simhash"))
    rows.foreach { r =>
      val (nP, nX, nH) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nH <= math.min(nP, nX), s"${r.getString(0)}: hits exceed a side")
      val (rec, agr) = (r.getDouble(4), r.getDouble(5))
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $rec")
      assert(agr >= 0.0 && agr <= 1.0, s"agreement out of range: $agr")
    }
    // the minhash estimator at tau 0.5 must recover most exact tau-0.6
    // pairs on the fixture (64 hashes, 16x4 bands — its design point);
    // unigram simhash is cruder by design, so no floor is asserted there
    val mh = rows.find(_.getString(0) == "minhash").get
    assert(mh.getLong(2) === 0L || mh.getDouble(4) >= 0.8,
      s"minhash recall ${mh.getDouble(4)} below design floor")
  }

  test("join_strategy_report: one verdict per modeled table, threshold-consistent") {
    val rows = graft.operators.Quality.joinStrategyReport(spark, TestSpark.Sf).collect()
    assert(rows.length === 7, "one row per join-graph table")
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("customer", "lineitem", "nation", "orders", "part", "region", "supplier"))
    rows.foreach { r =>
      val (n, b, s) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(n > 0 && b > 0, s"${r.getString(0)}: empty stats")
      assert(b >= 8L * n, s"${r.getString(0)}: bytes below the fixed-width floor")
      assert(s === (if (b <= 10485760L) "broadcast" else "shuffle"),
        s"${r.getString(0)}: verdict inconsistent with threshold")
    }
    // the advisory must agree with what the engine actually plans: the
    // canonical J1 dim (part, 'broadcast' here) broadcast-joins
    assert(rows.find(_.getString(0) == "region").get.getString(3) === "broadcast")
  }

  test("event_sequence_topk: bounded, ordered, and consistent with a recount") {
    val rows = graft.operators.Retention.eventSequenceTopk(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ns = rows.map(_.getLong(3)).toSeq
    assert(ns === ns.sortBy(-_), "paths must be ordered by count desc")
    rows.foreach(r => (0 to 2).foreach(i => assert(!r.isNullAt(i))))
    // recount the top path independently via a self-join-free pass
    val (s1, s2, s3, n) =
      (rows.head.getString(0), rows.head.getString(1), rows.head.getString(2),
        rows.head.getLong(3))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val recount = Tables.events(spark, TestSpark.Sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("b", lead(col("event_type"), 1).over(w))
      .withColumn("c", lead(col("event_type"), 2).over(w))
      .filter(col("event_type") === s1 && col("b") === s2 && col("c") === s3)
      .count()
    assert(recount === n, s"top path ($s1,$s2,$s3) recount mismatch")
  }

  test("compaction_plan: actions split on the target and bins pack next-fit") {
    val rows = StatsManifest.compactionPlan(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val target = 25000L
    rows.foreach { case (day, n, action, bin) =>
      if (action == "keep") assert(n >= target && bin == -1L, s"day $day keep contract")
      else assert(action == "compact" && n < target && bin >= 0L, s"day $day compact contract")
    }
    // coverage: every event-day appears exactly once, and the plan's row
    // total is the table's row total
    assert(rows.map(_._1).distinct.length === rows.length)
    val evRows = Tables.events(spark, TestSpark.Sf).count()
    assert(rows.map(_._2).sum === evRows)
    // next-fit: compact bins are contiguous day runs with nondecreasing
    // ids, and a bin only closes once it has reached the target (drop
    // the bin's last file and the remainder is under target)
    val compacts = rows.filter(_._3 == "compact").sortBy(_._1)
    assert(compacts.map(_._4).toSeq === compacts.map(_._4).sorted.toSeq)
    compacts.groupBy(_._4).foreach { case (bin, fs) =>
      val total = fs.map(_._2).sum
      assert(total - fs.maxBy(_._1)._2 < target,
        s"bin $bin closed before reaching the target")
    }
  }

  test("lsh_band_sweep: S-curve monotonicity and verify bounds hold") {
    val rows = Dedup.lshBandSweep(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // one row per priced configuration, ordered by band count, and every
    // split reassembles the same k=64 signature
    assert(rows.map(_._1).toSeq === Seq(8L, 16L, 32L))
    rows.foreach { case (nb, r, _, _, _) => assert(nb * r === 64L, "splits must cover k") }
    // verified pairs are candidates that passed the estimate filter
    rows.foreach { case (nb, _, _, cand, ver) =>
      assert(ver <= cand, s"config $nb: verified ($ver) exceeds candidates ($cand)")
    }
    // the S-curve steers left as rows-per-band shrinks: any band match
    // under the coarse split is a band match under every finer split of
    // the same signature (an 8-row band equality implies both its 4-row
    // halves match), so with no hot-bucket loss candidate sets are
    // supersets down the sweep and the counts are monotone
    if (rows.forall(_._3 == 0L)) {
      assert(rows.map(_._4).toSeq === rows.map(_._4).sorted.toSeq,
        "candidates must be nondecreasing in band count")
      assert(rows.map(_._5).toSeq === rows.map(_._5).sorted.toSeq,
        "verified pairs must be nondecreasing in band count")
    }
    // the fixture's seeded near-dup pairs survive even the coarsest split
    assert(rows.head._5 >= 1L, "8x8 must verify at least one fixture near-dup pair")
  }

  test("minhash_k_curve: error bounds and flag counts are coherent") {
    val rows = Dedup.minhashKCurve(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(16L, 32L, 64L))
    // every arm grades the SAME anchor pair set
    assert(rows.map(_._2).distinct.length === 1)
    assert(rows.head._2 >= 1L, "fixture anchor must contain near-dup pairs")
    rows.foreach { case (k, n, mae, bias, flagged) =>
      // est and jaccard both live in [0,1], so the error stats must too,
      // and the mean signed error can never exceed the mean absolute one
      assert(mae >= 0.0 && mae <= 1.0, s"k=$k mae $mae out of range")
      assert(math.abs(bias) <= mae + 1e-9, s"k=$k |bias| $bias exceeds mae $mae")
      assert(flagged >= 0L && flagged <= n, s"k=$k flagged $flagged out of [0,$n]")
    }
    // anchor pairs have exact jaccard >= 0.6; an unbiased estimator at
    // k=64 cannot miss ALL of them at a 0.5 verify threshold
    assert(rows.last._5 >= 1L, "k=64 must flag at least one anchor pair")
  }

  test("k_anonymity: histogram accounts for every customer row exactly once") {
    val rows = operators.Curation.kAnonymity(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val nCustomers = Tables.customer(spark, TestSpark.Sf).count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === nCustomers,
      "class_size * n_classes must partition the table")
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(0) * r.getLong(1), "n_rows identity")
      val expect = if (r.getLong(0) < 5) "at_risk" else "anonymous"
      assert(r.getString(3) === expect, s"verdict at class_size ${r.getLong(0)}")
    }
    // per-row rounding to 6 places bounds the share-sum drift
    val pctSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(pctSum - 1.0) <= rows.length * 1e-6, s"pct_rows sum $pctSum")
  }

  test("split_drift_psi: shares sum to 1, total is the bin sum, verdict matches") {
    val rows = operators.Pipeline.splitDriftPsi(spark, TestSpark.Sf).collect()
    // the fixed histogram support: all 6 bins present even when empty,
    // so the smoothed shares sum to 1 and no PSI term is dropped
    assert(rows.length === 6, s"expected the fixed 6-bin support, got ${rows.length}")
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 50L, 100L, 200L, 400L, 800L))
    val pctT = rows.map(r => BigDecimal(r.getDouble(3))).sum.toDouble
    val pctV = rows.map(r => BigDecimal(r.getDouble(4))).sum.toDouble
    assert(math.abs(pctT - 1.0) <= 6e-6 && math.abs(pctV - 1.0) <= 6e-6,
      s"smoothed shares must sum to 1: train=$pctT val=$pctV")
    // Laplace-smoothed shares over the SAME 6-bin support sum to
    // (n_bins_present + …)/… — with all bins present they sum to 1
    val psiTotal = rows.head.getDouble(6)
    assert(rows.forall(r => r.getDouble(6) === psiTotal), "psi_total constant")
    val binSum = rows.map(r => BigDecimal(r.getDouble(5))).sum.toDouble
    assert(math.abs(binSum - psiTotal) < 1e-9, s"total $psiTotal != bin sum $binSum")
    val expect = if (psiTotal > 0.2) "drift" else if (psiTotal > 0.1) "warn" else "stable"
    assert(rows.forall(_.getString(7) === expect))
    // a salted-hash split cannot drift: the fixture must read stable
    assert(expect === "stable", s"hash split drifted? psi=$psiTotal")
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(4) > 0.0, "smoothed shares positive")
    }
  }

  test("dedup_source_matrix: pair mass conserved, canonical order, scope correct") {
    val pairs  = operators.Dedup.dedupMinhash(spark, TestSpark.Sf).count()
    val rows   = operators.Dedup.dedupSourceMatrix(spark, TestSpark.Sf).collect()
    assert(rows.map(_.getLong(2)).sum === pairs,
      "every verified pair lands in exactly one source cell")
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      if (a != null && b != null) assert(a <= b, s"canonical order violated: $a > $b")
      // NULL is canonicalized to source_b: source_a is NULL only when
      // BOTH sides were unknown
      if (a == null) assert(b == null, s"NULL in source_a beside non-NULL $b")
      val expect = if (a != null && a == b) "within" else "cross"
      assert(r.getString(3) === expect, s"scope at ($a, $b)")
    }
  }

  test("quality_vs_dup: doc mass conserved; pass counts match quality_filter") {
    val rows = operators.Dedup.qualityVsDup(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.Sf).count()
    assert(rows.map(_.getLong(1)).sum === docs,
      "every document lands in exactly one duplication bucket")
    // the SAME pass flag as quality_filter: global pass mass must agree
    val passTotal = operators.TextNgrams.qualityFilter(spark, TestSpark.Sf)
      .collect().map(_.getLong(2)).sum
    assert(rows.map(_.getLong(2)).sum === passTotal,
      "bucketed pass count diverged from quality_filter's")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_pass bounded by n_docs")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0, "avg_chars positive")
    }
  }

  test("ann_nprobe_curve: candidates and recall are monotone in nprobe") {
    val rows = operators.Similarity.annNprobeCurve(spark, TestSpark.Sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(2) <= hi.getLong(2), "candidate volume grows with nprobe")
      assert(lo.getLong(4) <= hi.getLong(4), "hits cannot shrink as probes widen")
    }
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5), "hits bounded by the exact anchor")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0, "recall in range")
      assert(r.getLong(2) <= r.getLong(1) * (TestSparkEmbeddingRows - 1),
        "candidates bounded by queries x corpus")
    }
  }
  private lazy val TestSparkEmbeddingRows =
    Tables.embeddings(spark, TestSpark.Sf).count()

  test("cluster_cohesion: cluster mass conserved; ratios and densities bounded") {
    val rows = operators.Dedup.clusterCohesion(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val nClusters = operators.Dedup.dedupClustersMinhash(spark, TestSpark.Sf)
      .select("cluster_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nClusters,
      "every cluster lands in exactly one size bucket")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "cohesive clusters bounded by total")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "avg_min_sim in [0,1]")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, "avg_density in [0,1]")
      // verified pair estimates sit at or above the 0.5 verify threshold,
      // so a cohesive bucket's mean weakest edge cannot be below
      // 0.5 * (n_cohesive / n_clusters-proportional floor) — check the
      // direct bound instead: min_sim >= 0.5 for every edge
      if (r.getLong(2) === r.getLong(1) && r.getLong(2) > 0)
        assert(r.getDouble(4) >= 0.5, "all-cohesive bucket mean weakest edge >= threshold")
    }
  }

  test("ann_ivf_incremental: stable serve over the stored base index plus delta") {
    val r1 = operators.Similarity.annIvfIncremental(spark, TestSpark.Sf).collect()
    assert(r1.nonEmpty)
    r1.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq,
        s"query $q ranks must be 1..k")
      rows.foreach(r => assert(r.getLong(1) != q, "self-match excluded"))
      val byRank = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q cosine not non-increasing down the ranks")
    }
    // second run serves from the SAME stored index — bit-identical
    val r2 = operators.Similarity.annIvfIncremental(spark, TestSpark.Sf).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
      "stored-index serve must be deterministic across runs")
  }

  test("embedding_knn_eval: counts and accuracies bounded; eval set respected") {
    val rows = operators.Similarity.embeddingKnnEval(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_correct bounded by n_eval")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "accuracy in range")
    }
    // evaluated vectors are exactly a subset of the held-out tenth
    val nEval = rows.map(_.getLong(1)).sum
    val heldOut = Tables.embeddings(spark, TestSpark.Sf)
      .filter(col("vec_id") % 10 === 0).count()
    assert(nEval <= heldOut, "cannot evaluate more vectors than were held out")
    assert(nEval > 0, "LSH candidates must cover at least one held-out vector")
  }

  test("label_noise_report: rates bounded; self never votes for itself") {
    val rows = operators.Similarity.labelNoiseReport(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val labeled = Tables.embeddings(spark, TestSpark.Sf)
      .filter(col("label").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum <= labeled,
      "cannot check more vectors than carry labels")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "flags bounded by checked")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "flag_rate in range")
    }
  }

  test("image_dedup_phash: candidate pairs binned; identical thumbs land in 0_exact") {
    val rows = graft.multimodal.Multimodal.imageDedupPhash(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) > 0, "emitted bins carry pairs"))
    // every candidate pair shares a 16-bit band, so hamming <= 48 always:
    // the 17+ bin may exist but a band-collision pair can't flip all bits
    val bins = rows.map(_.getString(0)).toSet
    assert(bins.subsetOf(Set("00_exact", "01-08_near", "09-16_weak", "17+_far")))
  }

  test("pack_fragmentation: docs and tokens are conserved; spans are feasible") {
    val rows = operators.TextNgrams.packFragmentation(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, TestSpark.Sf)
    assert(rows.map(_.getLong(1)).sum === docs.count(),
      "every document appears in exactly one span group")
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " ")) + 1)).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum === totalTokens,
      "token mass (incl. EOS) is conserved through the prefix sum")
    rows.foreach { r =>
      val (span, nDocs, toks) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(span >= 1L, "every doc occupies at least one window")
      // a doc spanning s windows must cover the s-2 interior ones fully
      assert(toks > nDocs * (span - 2) * 2048,
        s"span $span infeasible for $nDocs docs with $toks tokens")
    }
  }
}
