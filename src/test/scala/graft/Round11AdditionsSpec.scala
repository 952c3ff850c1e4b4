package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round11AdditionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Crafted quoted-article corpus written as a real parquet dir so the
    * queries run their actual scan path: doc 2 begins with doc 1's full
    * text (containment(1→2) = 1.0, jaccard = 3/10 < 0.6) — the subset
    * shape symmetric-Jaccard canonicalization is blind to.
    */
  private lazy val quotedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-kbcont").toString
    import spark.implicits._
    Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (3L, "x1 x2 x3 x4 x5 x6"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("split_contamination_fuzzy: a train→val near-dup is counted, clean docs are not") {
    // md5('split:0')[0]='0' → train, 'split:1'='c' → val, 'split:10'='f'
    // → test. doc 1 duplicates doc 0's text (est_jaccard = 1.0 — every
    // band collides by construction), doc 10 shares nothing.
    val dir = java.nio.file.Files.createTempDirectory("graft-scf").toString
    import spark.implicits._
    val dup = (1 to 30).map(i => s"a$i").mkString(" ")
    Seq(
      (0L, dup),
      (1L, dup),
      (10L, (1 to 30).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.splitContaminationFuzzy(spark, dir).collect()
    val byS = rows.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byS("val") === ((1L, 1L, 1.0)), s"val row wrong: ${byS.get("val")}")
    assert(byS("test") === ((1L, 0L, 0.0)), s"test row wrong: ${byS.get("test")}")
  }

  test("split_contamination_fuzzy agrees with a driver-side recount of the pair kernel") {
    def splitOf(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.head
      if (h <= 'b') "train" else if (h <= 'd') "val" else "test"
    }
    val pairs = operators.Dedup.dedupMinhash(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs
      .flatMap { case (a, b) =>
        (splitOf(a), splitOf(b)) match {
          case ("train", sb) if sb != "train" => Some((b, sb))
          case (sa, "train") if sa != "train" => Some((a, sa))
          case _                              => None
        }
      }
      .distinct.groupBy(_._2).map { case (s, ds) => s -> ds.length.toLong }
    val got = operators.Dedup.splitContaminationFuzzy(spark, TestSpark.Sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    Seq("val", "test").foreach { s =>
      assert(got.getOrElse(s, 0L) === expected.getOrElse(s, 0L),
        s"$s leaked-doc count diverged from the pair-level recount")
    }
  }

  test("dedup_keep_best_containment: a strict-subset doc is clustered and dropped") {
    val kb = operators.Dedup.dedupKeepBestContainment(spark, quotedDir).collect()
    val c1 = kb.find(_.getLong(0) == 1L)
    assert(c1.isDefined, "the quoted-article pair forms cluster 1 via the containment edge")
    assert(c1.get.getLong(1) === 2L, "the longer (superset) doc is kept")
    assert(c1.get.getLong(3) === 2L, "the subset doc is a dropped member")
    // doc 3 shares no shingle with anything — no cluster, survives as-is
    assert(!kb.exists(_.getLong(1) == 3L))
  }

  test("dedup_keep_best (symmetric Jaccard) misses the same subset pair") {
    val kb = operators.Dedup.dedupKeepBest(spark, quotedDir).collect()
    assert(kb.isEmpty,
      "jaccard 0.3 < 0.6: no edge, no cluster — the subset dup survives, " +
        "which is exactly the gap the containment tier closes")
  }

  test("containment keep_best covers at least the symmetric clusters on the fixture") {
    val plain = operators.Dedup.dedupKeepBest(spark, TestSpark.Sf).collect()
    val cont  = operators.Dedup.dedupKeepBestContainment(spark, TestSpark.Sf).collect()
    // union edge set ⊇ jaccard edge set → every symmetric-clustered doc
    // stays clustered (components can only merge), so member mass and
    // per-cluster sizes cannot shrink
    val plainMass = plain.map(_.getLong(3)).sum
    val contMass  = cont.map(_.getLong(3)).sum
    assert(contMass >= plainMass, s"member mass shrank: $plainMass -> $contMass")
    // canonical pick is still deterministic: kept docs unique
    assert(cont.map(_.getLong(1)).distinct.length === cont.length)
  }

  test("dedup_containment_minhash: estimates well-formed, near-dup slice agrees with dedup_minhash") {
    val rows = operators.Dedup.dedupContainmentMinhash(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "fixture corpus carries high-containment candidates")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs canonical doc_a < doc_b")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.8 && r.getDouble(3) <= 1.0, "clamped est_cmax in [0.8, 1]")
    }
    // same candidate set, same sketch: the est_jaccard >= 0.5 slice must
    // be a subset of dedup_minhash's verified pairs
    val mh = operators.Dedup.dedupMinhash(spark, TestSpark.Sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.filter(_.getDouble(2) >= 0.5)
      .foreach(r => assert(mh.contains((r.getLong(0), r.getLong(1)))))
  }

  test("dedup_containment_minhash: exact-prefix duplicate estimated at full containment") {
    // doc 2 = doc 1 verbatim plus a tail: true containment 1.0, true
    // jaccard 10/16 — high enough that a 4-row band deterministically
    // fires, low enough to sit under many near-dup thresholds. The
    // estimator must recover cmax ≈ 1.0 from signature agreement + sizes.
    val dir = java.nio.file.Files.createTempDirectory("graft-contmh").toString
    import spark.implicits._
    val tail = "t1 t2 t3 t4 t5 t6"
    Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (2L, s"w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 $tail"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Dedup.dedupContainmentMinhash(spark, dir).collect()
    val p12 = got.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined, "the prefix-duplicate pair must surface")
    assert(p12.get.getDouble(3) >= 0.9, s"est_cmax ${p12.get.getDouble(3)} should be ~1.0")
  }

  test("keep_best_containment above the cap routes to the bounded minhash+containment tier") {
    Downgrades.last = None
    val routed =
      operators.Dedup.dedupKeepBestContainmentGuarded(spark, TestSpark.Sf, cap = 10)
    assert(routed.columns.toSeq ===
      Seq("cluster_id", "kept_doc", "kept_chars", "n_members"))
    val rows = routed.collect()
    assert(Downgrades.last.exists(m =>
      m.contains("dedup_keep_best_containment") && m.contains("containment_minhash")))
    assert(rows.map(_.getLong(1)).distinct.length === rows.length, "kept docs unique")
    // the routed tier is a superset graph of the plain minhash clusters:
    // member mass cannot be below the symmetric minhash keep-best mass
    val mhMass = operators.Dedup.dedupClustersMinhash(spark, TestSpark.Sf).count()
    assert(rows.map(_.getLong(3)).sum >= mhMass)
  }

  test("vocab_topk: head ranks dense from 1, shares in (0,1] and non-increasing by count") {
    val rows = operators.TextNgrams.vocabTopk(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length).toSeq)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("ngram_novelty: saturation curve well-formed; first bucket fully novel; shares reach 1") {
    val rows = operators.TextNgrams.ngramNovelty(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val withShingles = rows.filter(_.getLong(2) > 0)
    assert(withShingles.nonEmpty, "fixture corpus carries shingles")
    // the first bucket that has any shingles sees them all for the first time
    val first = withShingles.head
    assert(first.getDouble(4) === 1.0, "first non-empty bucket is 100% novel")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "novel bounded by distinct")
      if (!r.isNullAt(4)) assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // cumulative vocabulary share is monotone and ends at 1.0
    val shares = rows.filterNot(_.isNullAt(5)).map(_.getDouble(5))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(math.abs(shares.last - 1.0) < 1e-9, s"final cum share ${shares.last}")
  }

  test("dedup_keep_best_minhash: one kept doc per minhash cluster, mass preserved") {
    val kb = operators.Dedup.dedupKeepBestMinhash(spark, TestSpark.Sf).collect()
    val clustered = operators.Dedup.dedupClustersMinhash(spark, TestSpark.Sf).count()
    assert(kb.map(_.getLong(3)).sum === clustered, "member mass equals cluster assignment")
    assert(kb.map(_.getLong(1)).distinct.length === kb.length, "kept docs unique")
    kb.foreach(r => assert(r.getLong(3) >= 2L, "singleton components cannot arise from edges"))
  }

  test("embedding_centroid_drift: population conserved, share shifts cancel, drift2 >= 0") {
    val rows = operators.Similarity.embeddingCentroidDrift(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val n = Tables.cachedCount(spark, TestSpark.Sf, "embeddings")
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === n,
      "every vector lands in exactly one (cell, half)")
    val shifts = rows.filterNot(_.isNullAt(3)).map(_.getDouble(3))
    assert(math.abs(shifts.sum) < 1e-4, s"share shifts should cancel: ${shifts.sum}")
    rows.filterNot(_.isNullAt(4)).foreach(r => assert(r.getDouble(4) >= 0.0))
  }

  test("embedding_outliers plan: per-cell stats via broadcast join, no corpus window") {
    val df = operators.Similarity.embeddingOutliers(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"embedding_outliers must not window the corpus:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-cell stats should broadcast-join back:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "outliers bounded by cell population")
    }
  }

  test("retrieval_eval: metric ranges hold and n_hit agrees with ann_recall") {
    val ev = operators.Similarity.retrievalEval(spark, TestSpark.Sf).collect()
    assert(ev.nonEmpty)
    ev.foreach { r =>
      val (nExact, nHit) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"))
      val (mrr, ndcg)    = (r.getAs[Double]("mrr"), Option(r.getAs[java.lang.Double]("ndcg")))
      assert(nHit <= nExact, "hits bounded by the relevant set")
      assert(mrr >= 0.0 && mrr <= 1.0, s"mrr out of range: $mrr")
      ndcg.foreach(v => assert(v >= 0.0 && v <= 1.0 + 1e-9, s"ndcg out of range: $v"))
      // rank-awareness invariants: hits exist iff mrr > 0; a full sweep
      // of the relevant set at the top of the list is the only ndcg=1
      if (nHit == 0L) assert(mrr === 0.0 && ndcg.forall(_ == 0.0))
      else assert(mrr > 0.0)
    }
    val recall = operators.Similarity.annRecall(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("method"), r.getAs[Long]("q_id")) -> r.getAs[Long]("n_hit"))
      .toMap
    ev.foreach { r =>
      val key = (r.getAs[String]("method"), r.getAs[Long]("q_id"))
      assert(recall(key) === r.getAs[Long]("n_hit"),
        s"$key: retrieval_eval n_hit diverges from ann_recall")
    }
    // rank-awareness must be observable: some arm has recall ties but
    // different ndcg, or at minimum not every ndcg is 0/1
    assert(ev.exists { r =>
      val v = Option(r.getAs[java.lang.Double]("ndcg"))
      v.exists(x => x > 0.0 && x < 1.0)
    }, "fixture never produces a partial-rank ndcg — metric not exercised")
  }

  test("dedup_detector_agreement: cube cells consistent with the shipped detectors") {
    val cube = operators.Dedup.dedupDetectorAgreement(spark, TestSpark.Sf).collect()
    assert(cube.nonEmpty)
    cube.foreach { r =>
      val (vx, vs) = (r.getAs[Boolean]("v_exact"), r.getAs[Boolean]("v_simhash"))
      val mj = r.getAs[Double]("mean_jaccard")
      val me = r.getAs[Double]("mean_est")
      val mh = r.getAs[Double]("mean_hamming")
      assert(r.getAs[Long]("n_pairs") > 0L, "empty cells must not be emitted")
      assert(mj >= 0.0 && mj <= 1.0, s"mean_jaccard out of range: $mj")
      assert(me >= 0.0 && me <= 1.0)
      assert(mh >= 0.0)
      // cell means must respect their own verdict cuts
      if (vx) assert(mj >= 0.6) else assert(mj < 0.6)
      if (vs) assert(mh <= 3.0) else assert(mh > 3.0)
    }
    // the v_exact=true slice of the cube IS dedup_jaccard's pair set
    val exactInCube = cube.filter(_.getAs[Boolean]("v_exact")).map(_.getAs[Long]("n_pairs")).sum
    val exactPairs  = operators.Dedup.dedupJaccard(spark, TestSpark.Sf).count()
    assert(exactInCube === exactPairs,
      s"cube v_exact mass $exactInCube != dedup_jaccard pair count $exactPairs")
    // disagreement must be observable on the fixture or the cube is trivial
    assert(cube.exists(r => r.getAs[Boolean]("v_exact") != r.getAs[Boolean]("v_simhash") ||
      r.getAs[Boolean]("v_exact") != r.getAs[Boolean]("v_minhash")),
      "all detectors agree everywhere — fixture exercises nothing")
  }

  test("simhash_threshold_curve: cumulative, consistent with the shipped hamming<=3 cut") {
    val curve = operators.Dedup.simhashThresholdCurve(spark, TestSpark.Sf).collect()
    assert(curve.nonEmpty)
    curve.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_hamming") < b.getAs[Long]("max_hamming"))
        assert(a.getAs[Long]("n_pairs") < b.getAs[Long]("n_pairs"),
          "cumulative pair count must strictly grow (rows exist only at populated hammings)")
        assert(a.getAs[Long]("n_hit") <= b.getAs[Long]("n_hit"))
        assert(a.getAs[Double]("recall") <= b.getAs[Double]("recall"))
      case _ => ()
    }
    curve.foreach { r =>
      assert(r.getAs[Long]("max_hamming") <= 8L)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_exact"))
    }
    // the cumulative count at the largest populated hamming <= 3 must
    // equal the shipped detector's pair count — same kernel, same cut
    val shipped = operators.Dedup.dedupSimhash(spark, TestSpark.Sf).count()
    val at3 = curve.filter(_.getAs[Long]("max_hamming") <= 3L)
    if (at3.nonEmpty)
      assert(at3.last.getAs[Long]("n_pairs") === shipped,
        "curve cumulative at hamming<=3 diverges from dedup_simhash")
    else assert(shipped === 0L)
    // the tuning window must extend past the shipped cut on the fixture
    assert(curve.exists(_.getAs[Long]("max_hamming") > 3L),
      "no candidates beyond hamming 3 — curve window not exercised")
  }
}
