package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

class SimilarityDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("neardup_threshold_curve is monotone and self-consistent") {
    val rows = Similarity.neardupThresholdCurve(spark, TestSpark.Sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "curve empty — thresholds miss the cosine range")
    // rows ascend by threshold; yields must be non-increasing
    rows.sliding(2).foreach {
      case Array((t1, p1, d1), (t2, p2, d2)) =>
        assert(t1 < t2)
        assert(p2 <= p1, s"n_pairs rose with threshold: $t1→$t2")
        assert(d2 <= d1, s"n_docs_dropped rose with threshold: $t1→$t2")
      case _ => ()
    }
    // a dropped doc needs at least one pair; pairs can share a drop doc
    rows.foreach { case (t, p, d) =>
      assert(d >= 1 && d <= p, s"t=$t: n_docs_dropped=$d vs n_pairs=$p")
    }
  }

  test("ann_ivf_stored serves byte-identical results to the in-plan build") {
    val inPlan = Similarity.annIvfTrained(spark, TestSpark.Sf).collect().toSeq
    val stored = Similarity.annIvfStored(spark, TestSpark.Sf).collect().toSeq
    assert(stored === inPlan,
      "stored-index serve path diverged from the in-plan IVF build")
    // second serve must hit the DerivedCache (no rebuild): same results,
    // and the stored cells layout is partitioned by cell for probe-side
    // partition pruning
    val again = Similarity.annIvfStored(spark, TestSpark.Sf)
    assert(again.collect().toSeq === inPlan)
    val scan = again.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || scan.contains("cell"),
      s"cells scan lost its partition column:\n$scan")
  }

  test("minhash-LSH pairs match exact jaccard pairs on the fixture") {
    val exact = Dedup.dedupJaccard(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhash(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    // LSH with 16x4 bands at est>=0.5 should recover all >=0.6 pairs
    assert((exact -- lsh).isEmpty, s"missed pairs: ${exact -- lsh}")
  }

  test("ann_lsh achieves reasonable recall of exact top-k") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact  = pairs(Similarity.annCosineTopK(spark, TestSpark.Sf))
    val approx = pairs(Similarity.annLsh(spark, TestSpark.Sf))
    val recall = (exact & approx).size.toDouble / exact.size
    // 8 tables x 6 planes on 64-dim data: top-1/2 neighbors land in
    // shared buckets much more often than random; full top-10 won't.
    assert(recall >= 0.2, s"LSH recall $recall unexpectedly low")
    assert(approx.forall { case (q, n) => q != n })
  }

  test("ann_ivf achieves reasonable recall of exact top-k") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact  = pairs(Similarity.annCosineTopK(spark, TestSpark.Sf))
    val approx = pairs(Similarity.annIvf(spark, TestSpark.Sf))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.1, s"IVF recall $recall unexpectedly low")
    assert(approx.forall { case (q, n) => q != n })
  }

  test("ann_recall agrees with the independently computed per-method recall") {
    val rows = Similarity.annRecall(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSet === Set("ann_ivf", "ann_lsh", "ann_pq"))
    rows.foreach { case (m, q, nExact, nHit, recall) =>
      assert(nExact >= 1 && nExact <= 10, s"$m/$q n_exact=$nExact")
      assert(nHit >= 0 && nHit <= nExact, s"$m/$q n_hit=$nHit > n_exact=$nExact")
      assert(math.abs(recall - nHit.toDouble / nExact) < 2e-6, s"$m/$q recall mismatch")
    }
    // cross-check one method against a from-scratch set intersection
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact  = pairs(Similarity.annCosineTopK(spark, TestSpark.Sf))
    val approx = pairs(Similarity.annIvf(spark, TestSpark.Sf))
    val reported = rows.filter(_._1 == "ann_ivf").map(_._4).sum
    assert(reported === (exact & approx).size.toLong,
      "ann_recall's ivf hit total disagrees with the direct intersection")
  }

  test("dedup clusters: every near-dup pair lands in one cluster, canonical id is min") {
    val pairs = Dedup.dedupJaccard(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dedupClusters(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    // canonical = smallest member of its component
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid === members.keys.min)
    }
  }

  test("exact dedup keeps one id per distinct text") {
    val out = Dedup.dedupExact(spark, TestSpark.Sf)
    assert(out.count() === out.select("keep_id").distinct().count())
  }

  test("text_stats ratios are within [0, 1]") {
    val rows = TextAnalysis.textStats(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stop = r.getDouble(4); val q = r.getDouble(5)
      assert(stop >= 0.0 && stop <= 1.0)
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("lang_id emits a prediction for every document") {
    val df = TextAnalysis.langId(spark, TestSpark.Sf)
    assert(df.filter("predicted_lang IS NULL").count() === 0)
    assert(df.count() === Tables.documents(spark, TestSpark.Sf).count())
  }

  test("dedup_incremental: delta-only universe, base-only matches, consistent verdicts") {
    val out = Dedup.dedupIncremental(spark, TestSpark.Sf).collect()
    val nDelta = Tables.documents(spark, TestSpark.Sf)
      .filter("doc_id % 10 >= 8").count()
    assert(out.length.toLong === nDelta, "one verdict row per delta doc")
    out.foreach { r =>
      val docId = r.getLong(0)
      assert(docId % 10 >= 8, s"non-delta doc $docId in output")
      val nDups = r.getLong(1)
      val keep  = r.getBoolean(4)
      assert(keep === (nDups == 0L), s"keep/n_dups disagree for $docId")
      if (!r.isNullAt(2)) {
        assert(r.getLong(2) % 10 < 8, s"dup_of must be a BASE doc for $docId")
        assert(r.getDouble(3) >= 0.5, "best match must clear the verify threshold")
      } else assert(nDups === 0L)
    }
    assert(out.exists(!_.getBoolean(4)), "fixture should contain at least one cross-split dup")
  }

  test("ann_pq: well-formed ADC top-k with recall against exact L2") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.annPq(spark, TestSpark.Sf).collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size === 10, "one block per query vector")
    perQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(3)).toSeq === (1L to 10L), s"q=$q rn not 1..10")
      val adcs = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(adcs.sliding(2).forall(p => p(0) <= p(1)), s"q=$q ADC not ascending")
      assert(adcs.forall(_ >= 0.0), s"q=$q negative ADC")
      assert(!rs.exists(_.getLong(1) == q), s"q=$q returned itself")
    }
    // recall@10 vs brute-force exact squared-L2 (PQ m=8, k=32 is a lossy
    // 32x compression; anything near-random would score ~10/n ≈ 0.02)
    val e = Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        expr("aggregate(zip_with(v, qv, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)").as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(asc("d2"), asc("vec_id"))))
      .filter(col("rn") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.3, f"PQ recall@10 = $recall%.2f — below the 0.3 floor")
  }

  test("ann_pq: an exact duplicate of a query vector ranks first") {
    // ADC(q, x) is minimized when x's codes equal q's own argmin codes —
    // which is exactly what an exact duplicate encodes to. So the dup
    // must be the top-1 neighbor (its ADC = q's own quantization error,
    // the floor of the metric).
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-pq-dup").toFile
    d.deleteOnExit()
    def vec(i: Int): Array[Float] =
      Array.tabulate(64)(j => (((i * 31 + j * 7 + i * j) % 97) / 97.0f) * 2 - 1)
    val rows = (0 until 40).map(i => (i.toLong, vec(i), 0)) :+ ((100L, vec(3), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(d.getAbsolutePath + "/embeddings.parquet")
    val out = Similarity.annPq(spark, d.getAbsolutePath).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
    val top1For3 = out.collectFirst { case (3L, 1L, n) => n }
    assert(top1For3 === Some(100L),
      s"duplicate of query 3 did not rank first: got $top1For3")
  }

  test("ann_ivfpq: well-formed IVFADC top-k with recall against exact L2") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.annIvfPq(spark, TestSpark.Sf).collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size === 10, "one block per query vector")
    perQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(3)).toSeq === (1L to 10L), s"q=$q rn not 1..10")
      val adcs = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(adcs.sliding(2).forall(p => p(0) <= p(1)), s"q=$q ADC not ascending")
      assert(adcs.forall(_ >= 0.0), s"q=$q negative ADC")
      assert(!rs.exists(_.getLong(1) == q), s"q=$q returned itself")
    }
    // recall@10 vs brute-force exact squared-L2. IVF-PQ stacks TWO
    // losses — candidates pruned to 2-of-8 cells, distances quantized
    // to m=8/k=32 residual codes — so the floor sits below ann_pq's
    // 0.3 (measured 0.32/0.33/0.23 at sf0.001/0.01/0.1; random ≈ 0.02)
    val e = Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        expr("aggregate(zip_with(v, qv, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)").as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(asc("d2"), asc("vec_id"))))
      .filter(col("rn") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.2, f"IVF-PQ recall@10 = $recall%.2f — below the 0.2 floor")
  }

  test("ann_ivfpq: an exact duplicate of a query vector ranks first") {
    // the dup lands in the query's own nearest coarse cell (identical
    // vector, identical argmin tie-break), so IVF pruning keeps it, and
    // its residual encodes to the query's own argmin codes — ADC floor,
    // rank 1 (the ann_pq invariant surviving the cell restriction)
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ivfpq-dup").toFile
    d.deleteOnExit()
    def vec(i: Int): Array[Float] =
      Array.tabulate(64)(j => (((i * 31 + j * 7 + i * j) % 97) / 97.0f) * 2 - 1)
    val rows = (0 until 40).map(i => (i.toLong, vec(i), 0)) :+ ((100L, vec(3), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(d.getAbsolutePath + "/embeddings.parquet")
    val out = Similarity.annIvfPq(spark, d.getAbsolutePath).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
    val top1For3 = out.collectFirst { case (3L, 1L, n) => n }
    assert(top1For3 === Some(100L),
      s"duplicate of query 3 did not rank first: got $top1For3")
  }

  test("ann_filtered returns only same-label neighbors, exact within the filter") {
    import org.apache.spark.sql.functions._
    val labels = Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).intValue).toMap
    val rows = Similarity.annFiltered(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getLong(0); val n = r.getLong(1)
      assert(labels(n) === labels(q), s"neighbor $n label ${labels(n)} != query $q label ${labels(q)}")
      assert(n !== q)
    }
    // within the label-restricted candidate set the search is EXACT:
    // per query, the filtered top-k equals the unfiltered exact ranking
    // restricted to same-label neighbors
    val exact = Similarity.annCosineTopK(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val perQ = rows.groupBy(_.getLong(0))
    perQ.foreach { case (q, rs) =>
      val exactSameLabel = exact
        .filter { case (eq, en, _) => eq == q && labels(en) == labels(q) }
        .map(_._2).toSeq
      val got = rs.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      // restriction preserves order: the unfiltered exact top-10's
      // same-label members must be exactly the filtered result's prefix
      assert(exactSameLabel.zip(got).forall { case (e, g) => e == g },
        s"q=$q filtered ranking disagrees with the exact same-label order")
    }
  }

  test("ivfpq_nprobe_curve: candidates and recall are monotone in nprobe") {
    val rows = Similarity.ivfPqNprobeCurve(spark, TestSpark.Sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    val cands  = rows.map(_.getLong(2))
    val recall = rows.map(_.getDouble(6))
    assert(cands.sliding(2).forall(p => p(0) <= p(1)), "candidate volume not monotone")
    assert(recall.sliding(2).forall(p => p(0) <= p(1)), "recall not monotone")
    assert(recall.last > 0.0, "zero recall at nprobe=4")
  }

  test("ann_index_health accounts for every encodable corpus vector") {
    val rows = Similarity.annIndexHealth(spark, TestSpark.Sf).collect()
    assert(rows.length === 8, "one row per coarse cell")
    val total = rows.map(_.getLong(1)).sum
    val corpus = Tables.embeddings(spark, TestSpark.Sf).count()
    assert(total === corpus, s"per-cell counts $total != corpus $corpus")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= r.getDouble(2),
        s"cell ${r.getInt(0)}: mean/max reconstruction error malformed")
    }
  }

  test("ann_ivfpq_stored serves byte-identical results to the in-plan IVFADC scan") {
    val inPlan = Similarity.annIvfPq(spark, TestSpark.Sf).collect().toSeq
    val stored = Similarity.annIvfPqStored(spark, TestSpark.Sf).collect().toSeq
    assert(stored === inPlan, "stored-codes IVFADC serve diverged from in-plan IVF-PQ")
    // second serve reuses the cell-partitioned index
    assert(Similarity.annIvfPqStored(spark, TestSpark.Sf).collect().toSeq === inPlan)
  }

  test("ann_pq_stored serves byte-identical results to the in-plan ADC scan") {
    val inPlan = Similarity.annPq(spark, TestSpark.Sf).collect().toSeq
    val stored = Similarity.annPqStored(spark, TestSpark.Sf).collect().toSeq
    assert(stored === inPlan, "stored-codes serve path diverged from in-plan PQ")
    // second serve must reuse the cached index and never scan embeddings
    // for the corpus side (queries still come from the base table)
    val again = Similarity.annPqStored(spark, TestSpark.Sf)
    assert(again.collect().toSeq === inPlan)
  }

  test("dedup_cluster_sizes histogram is consistent with the cluster assignment") {
    val assign = graft.operators.Dedup
      .dedupClustersMinhash(spark, TestSpark.Sf).collect()
    val hist = graft.operators.Dedup
      .dedupClusterSizes(spark, TestSpark.Sf).collect()
    assert(hist.nonEmpty)
    // clusters come from the pair graph, so no singleton rows
    hist.foreach { r =>
      assert(r.getLong(0) >= 2L, s"pair-graph cluster of size < 2: $r")
      assert(r.getLong(2) === r.getLong(0) * r.getLong(1), s"n_docs algebra: $r")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1), s"n_removable algebra: $r")
    }
    assert(hist.map(_.getLong(2)).sum === assign.length,
      "histogram must partition the clustered docs")
    val bySize = assign.groupBy(_.getLong(1)).values.map(_.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(hist.map(r => r.getLong(0) -> r.getLong(1)).toMap === bySize,
      "histogram diverges from a direct recount of the assignment")
  }
}
