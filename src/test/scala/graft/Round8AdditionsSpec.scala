package graft

import graft.operators.{Curation, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 additions: the per-source repetition profile, SemDeDup-style
  * semantic dedup, and the end-to-end curation funnel. Oracle hashes are
  * covered by the driver gate; these specs prove the semantics the
  * oracle can't see — crafted repetitive fixtures, verdict invariants,
  * the quadratic-guard downgrade, and stage chaining.
  */
class Round8AdditionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("repetition_profile: crafted repetitive doc flags, diverse doc does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", ("spam ham " * 40).trim),                  // one dominant bigram
      (2L, "srcB", (1 to 80).map(i => s"w$i").mkString(" "))) // all bigrams distinct
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.repetitionProfileOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("srcA").getLong(4) === 1L, "repetitive doc must flag")
    assert(out("srcA").getLong(2) === 1L && out("srcA").getLong(3) === 1L,
      "repetitive doc must trip BOTH the top-share and duplicate gates")
    assert(out("srcB").getLong(4) === 0L, "diverse doc must not flag")
    assert(out("srcB").getDouble(6) === 0.0, "diverse doc dup2_rate must be 0")
  }

  test("repetition_profile: corpus invariants (flag algebra, rates in range)") {
    val rows = TextAnalysis.repetitionProfile(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, fTop, fDup, fAll) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(fAll <= nDocs, s"${r.getString(0)}: more flags than docs")
      assert(fAll <= fTop + fDup && fAll >= math.max(fTop, fDup),
        s"${r.getString(0)}: either-flag count outside union bounds")
      val (tr, dr) = (r.getDouble(5), r.getDouble(6))
      assert(tr > 0.0 && tr <= 1.0, s"top2_rate out of range: $tr")
      assert(dr >= 0.0 && dr < 1.0, s"dup2_rate out of range: $dr")
    }
  }

  test("semantic_dedup: one verdict per vector, rank-1 keeps, drops match earlier same-cell") {
    val rows = Similarity.semanticDedup(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length === ids.length, "one verdict per vec_id")
    val rkOf   = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    var drops = 0
    rows.foreach { r =>
      val (cell, rk, v) = (r.getInt(1), r.getLong(2), r.getString(3))
      if (rk == 1L) assert(v === "keep", s"rank-1 member of cell $cell must keep")
      if (v == "drop") {
        drops += 1
        assert(!r.isNullAt(4) && !r.isNullAt(5), "drop must carry its match")
        val m = r.getLong(4)
        assert(cellOf(m) === cell, "match must live in the same cluster")
        assert(rkOf(m) < rk, "match must be earlier-ranked (closer to centroid)")
        assert(r.getDouble(5) >= 0.38, "match cosine below threshold")
      } else assert(r.isNullAt(4) && r.isNullAt(5), "keep must carry no match")
    }
    assert(drops > 0, "fixture corpus must produce at least one semantic drop")
  }

  test("semantic_dedup: above-cap corpus downgrades to LSH candidates (drops ⊆ exact drops)") {
    Downgrades.last = None
    val approx = Similarity.semanticDedupGuarded(spark, TestSpark.Sf, cap = 1)
    val aRows = approx.collect()
    assert(Downgrades.last.exists(_.contains("semantic_dedup")),
      "downgrade must be recorded")
    assert(approx.columns.toSeq ===
      Seq("vec_id", "cell", "rk", "verdict", "matched_id", "match_cos"))
    assert(aRows.map(_.getLong(0)).distinct.length === aRows.length)
    val exactDrops = Similarity.semanticDedup(spark, TestSpark.Sf)
      .filter(col("verdict") === "drop").collect().map(_.getLong(0)).toSet
    val lshDrops = aRows.filter(_.getString(3) == "drop").map(_.getLong(0)).toSet
    assert(lshDrops.subsetOf(exactDrops),
      "LSH candidate set is a subset of all same-cell pairs, so its drops must be too")
  }

  test("curation_funnel: 4 chained stages, monotone survivors, stage-1 sees the corpus") {
    val rows = Curation.curationFunnel(spark, TestSpark.Sf).collect()
    assert(rows.length === 4)
    val stages = rows.sortBy(_.getInt(0))
    assert(stages.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    stages.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"stage ${r.getInt(0)}: n_out > n_in")
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3),
        s"stage ${r.getInt(0)}: n_dropped inconsistent")
    }
    stages.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) === a.getLong(3),
        s"stage ${b.getInt(0)}: n_in must chain from previous n_out")
    }
    val n0 = Tables.documents(spark, TestSpark.Sf).count()
    assert(stages.head.getLong(2) === n0, "stage 1 must see every document")
  }
}
