package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 additions: token-level exact-substring dedup and the
  * interpolated bigram LM gate.
  */
class Round12AdditionsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def docsFrame(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** True iff the CDC boundary rule puts NO cut between words a and b
    * (md5 of "a b" does not start with hex '0' — Cdc.chunkFrame's rule).
    */
  private def noCut(a: String, b: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest((a + " " + b).getBytes("UTF-8"))
    (h(0) & 0xf0) != 0
  }

  /** 50 tokens with no internal CDC boundary: every consecutive pair
    * hashes away from the cut pattern, so the whole run lives inside one
    * content-defined chunk of any document containing it.
    */
  private lazy val cutFreeOverlap: Seq[String] = cutFreeRun("ovl", 50)

  test("dedup_substring catches a 50-token verbatim overlap that CDC chunking misses") {
    val overlap = cutFreeOverlap
    assert(overlap.size === 50)
    assert(overlap.sliding(2).forall(p => noCut(p.head, p.last)),
      "fixture must have no internal CDC cut")
    val doc1 = ((1 to 30).map(i => s"pre_a$i") ++ overlap ++
      (1 to 30).map(i => s"suf_a$i")).mkString(" ")
    val doc2 = ((1 to 30).map(i => s"pre_b$i") ++ overlap ++
      (1 to 30).map(i => s"suf_b$i")).mkString(" ")
    val docs = docsFrame(Seq(1L -> doc1, 2L -> doc2))

    // CDC is blind to it: zero chunk hashes shared between the two docs
    // (the overlap has no internal cut, so the chunk containing it
    // extends into the doc-specific surroundings on both sides)
    val sharedChunks = operators.Cdc.chunkFrame(docs)
      .groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .count()
    assert(sharedChunks === 0L, "fixture must be invisible to CDC chunking")

    // the substring pass finds the pair, with the exact overlap length
    val rows = operators.Cdc.dedupSubstringOf(docs).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === 1L && rows.head.getLong(1) === 2L)
    assert(rows.head.getLong(2) === 1L, "exactly one shared 50-token window")
    assert(rows.head.getLong(3) === 50L, "est_overlap_tokens = n_shared + W - 1")
  }

  test("dedup_substring: a 49-token overlap is below the target length — no pair") {
    val overlap = cutFreeOverlap.take(49)
    val doc1 = ((1 to 30).map(i => s"pre_c$i") ++ overlap ++
      (1 to 30).map(i => s"suf_c$i")).mkString(" ")
    val doc2 = ((1 to 30).map(i => s"pre_d$i") ++ overlap ++
      (1 to 30).map(i => s"suf_d$i")).mkString(" ")
    val docs = docsFrame(Seq(3L -> doc1, 4L -> doc2))
    assert(operators.Cdc.dedupSubstringOf(docs).count() === 0L)
  }

  test("dedup_substring: contiguous multi-window overlap reports its exact length") {
    // a 60-token shared run = 11 shared 50-token windows; est = 11+49 = 60
    val overlap = cutFreeRun("run", 60)
    val doc1 = ((1 to 10).map(i => s"pre_e$i") ++ overlap).mkString(" ")
    val doc2 = (overlap ++ (1 to 10).map(i => s"suf_f$i")).mkString(" ")
    val rows = operators.Cdc.dedupSubstringOf(
      docsFrame(Seq(5L -> doc1, 6L -> doc2))).collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(2) === 11L)
    assert(rows.head.getLong(3) === 60L)
  }

  /** Cut-free token run with a caller-chosen prefix (distinct prefixes
    * give disjoint vocabularies, so two runs never share windows).
    */
  private def cutFreeRun(prefix: String, n: Int): Seq[String] = {
    val words = scala.collection.mutable.ArrayBuffer(s"${prefix}0")
    var i = 1
    while (words.size < n) {
      val cand = s"$prefix$i"
      i += 1
      if (noCut(words.last, cand)) words += cand
    }
    words.toSeq
  }

  test("dedup_substring_spans: one contiguous run reports its exact length") {
    val overlap = cutFreeRun("run", 60)
    val doc1 = ((1 to 10).map(i => s"pre_g$i") ++ overlap).mkString(" ")
    val doc2 = (overlap ++ (1 to 10).map(i => s"suf_h$i")).mkString(" ")
    val rows = operators.Cdc.dedupSubstringSpansOf(
      docsFrame(Seq(7L -> doc1, 8L -> doc2))).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 7L && r.getLong(1) === 8L)
    assert(r.getLong(2) === 1L, "one maximal span")
    assert(r.getLong(3) === 60L, "exact span length, not an estimate")
    assert(r.getLong(4) === 11L, "11 shared window pairs in a 60-token run")
  }

  test("dedup_substring_spans: two separate regions are two spans (where est_overlap is wrong)") {
    val ovA = cutFreeRun("ova", 50)
    val ovB = cutFreeRun("ovb", 50)
    val doc1 = (ovA ++ (1 to 7).map(i => s"mid_a$i") ++ ovB).mkString(" ")
    val doc2 = (ovA ++ (1 to 13).map(i => s"mid_b$i") ++ ovB).mkString(" ")
    val rows = operators.Cdc.dedupSubstringSpansOf(
      docsFrame(Seq(9L -> doc1, 10L -> doc2))).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(2) === 2L, "two maximal spans")
    assert(r.getLong(3) === 50L, "each region is exactly 50 tokens")
    assert(r.getLong(4) === 2L)
    // contrast: dedup_substring's single-region estimate under-reports
    // the same pair as one 51-token overlap (2 shared windows + 49)
    val est = operators.Cdc.dedupSubstringOf(
      docsFrame(Seq(9L -> doc1, 10L -> doc2))).collect()
    assert(est.head.getLong(3) === 51L)
  }

  test("dedup_substring_strip: keep-first removal, exact covered-token counts") {
    val overlap = cutFreeRun("stp", 55) // 55-token run = 6 shared windows
    val doc1 = ((1 to 20).map(i => s"pre_k$i") ++ overlap).mkString(" ")
    val doc2 = (overlap ++ (1 to 20).map(i => s"suf_k$i")).mkString(" ")
    val doc3 = (1 to 60).map(i => s"solo$i").mkString(" ")
    val rows = operators.Cdc.dedupSubstringStripOf(
      docsFrame(Seq(11L -> doc1, 12L -> doc2, 13L -> doc3))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // keep-first: doc 11 (lowest id) keeps its text, doc 12 removes the
    // full 55-token covered region (6 windows x 50 positions, unioned)
    assert(rows(11L) === ((75L, 0L, 0.0)))
    assert(rows(12L)._1 === 75L)
    assert(rows(12L)._2 === 55L, "covered positions union to the exact overlap length")
    assert(rows(13L) === ((60L, 0L, 0.0)))
  }

  test("TokenWindowHashes: O(1) rolling slide, position independence, exact output shape") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: Seq[String]) =
      new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])
    def hashes(ts: Seq[String], w: Int): Seq[Long] = {
      val out = functions.TokenWindowHashes.compute(arr(ts), w)
      (0 until out.numElements()).map(out.getLong(_))
    }
    // shape: exactly n-w+1 hashes; empty below the window length
    assert(hashes((1 to 10).map("t" + _), 4).size === 7)
    assert(hashes((1 to 3).map("t" + _), 4).isEmpty)
    // the rolling slide must equal a from-scratch window hash:
    // identical windows at DIFFERENT positions (and in different docs)
    // hash identically — the property cross-doc matching rests on
    val run = (1 to 6).map("w" + _)
    val d1 = Seq("x1", "x2") ++ run ++ Seq("y1")
    val d2 = Seq("z1", "z2", "z3", "z4", "z5") ++ run
    val h1 = hashes(d1, 4)
    val h2 = hashes(d2, 4)
    assert(h1.slice(2, 5) === h2.slice(5, 8),
      "shared 6-token run must yield identical window hashes at any offset")
    // repeated window inside ONE doc hashes identically
    val rep = Seq("a", "b", "c") ++ Seq("sep1", "sep2") ++ Seq("a", "b", "c")
    val hr = hashes(rep, 3)
    assert(hr.head === hr(5))
    // and distinct windows do not collide on this fixture
    val uniq = hashes((1 to 200).map("u" + _), 4)
    assert(uniq.distinct.size === uniq.size)
    // order sensitivity: a permuted window hashes differently
    assert(hashes(Seq("a", "b", "c"), 3).head !== hashes(Seq("c", "b", "a"), 3).head)
  }

  test("lm_score_bigram: a shuffled-word doc scores worse than its natural twin") {
    val natural = "the cat sat on the mat and the dog lay by the door"
    // same token multiset, order destroyed — a unigram LM scores these
    // identically (same tokens, same corpus probabilities); the
    // interpolated bigram gate must not
    val shuffled = "mat the by dog the on lay door sat the and cat the"
    assert(natural.split(" ").sorted.toSeq === shuffled.split(" ").sorted.toSeq,
      "twins must share one token multiset")
    val train = docsFrame((1L to 40L).map(i => i -> natural))
    val (uni, bg, tot) = operators.TextAnalysis.lmScoreBigramCounts(train)
    val out = operators.TextAnalysis
      .lmScoreBigramServe(
        docsFrame(Seq(100L -> natural, 101L -> shuffled)), uni, bg, tot)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(100L)._1 === out(101L)._1, "same bigram count on both twins")
    assert(out(100L)._2 < out(101L)._2,
      s"natural ${out(100L)._2} must beat shuffled ${out(101L)._2}")
    // and the natural doc's NLL is far below: its bigrams are all in-model
    assert(out(101L)._2 - out(100L)._2 > 1.0,
      "order destruction must cost more than 1 bit/bigram on this fixture")
  }

  test("lm_score_bigram: OOV-context docs fall back to the unigram term (P stays positive)") {
    val train = docsFrame((1L to 5L).map(i => i -> "a b c d e"))
    val (uni, bg, tot) = operators.TextAnalysis.lmScoreBigramCounts(train)
    val out = operators.TextAnalysis
      .lmScoreBigramServe(
        docsFrame(Seq(7L -> "zz yy xx ww")), uni, bg, tot)
      .collect()
    assert(out.length === 1)
    val nll = out.head.getDouble(2)
    assert(!nll.isNaN && !nll.isInfinite, s"OOV doc must score finite, got $nll")
    assert(nll > 0.0)
  }
}
