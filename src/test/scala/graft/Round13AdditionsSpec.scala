package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions: the stripped-corpus materialization, incremental
  * substring dedup, the editdist verify budget, and the W tuning curve.
  */
class Round13AdditionsSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private def docsFrame(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  /** True iff the CDC boundary rule puts NO cut between words a and b —
    * same fixture discipline as Round12AdditionsSpec so planted overlaps
    * stay CDC-invisible and window-contiguous.
    */
  private def noCut(a: String, b: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest((a + " " + b).getBytes("UTF-8"))
    (h(0) & 0xf0) != 0
  }

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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedup_substring_strip_text: exact stripped text on the two-region fixture") {
    val ovA = cutFreeRun("ova", 50)
    val ovB = cutFreeRun("ovb", 50)
    val midA = (1 to 7).map(i => s"mid_a$i")
    val midB = (1 to 13).map(i => s"mid_b$i")
    val doc1 = (ovA ++ midA ++ ovB).mkString(" ")
    val doc2 = (ovA ++ midB ++ ovB).mkString(" ")
    val doc3 = (1 to 60).map(i => s"solo$i").mkString(" ")
    val out = operators.Cdc.dedupSubstringStripTextOf(
      docsFrame(Seq(9L -> doc1, 10L -> doc2, 13L -> doc3))).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // keep-first: doc 9 (lowest id) keeps both regions verbatim
    assert(out(9L) === ((107L, 0L, md5hex(doc1))))
    // doc 10 loses BOTH 50-token covered regions; what remains is
    // exactly its 13 middle tokens — asserted as the exact text hash
    assert(out(10L)._1 === 113L)
    assert(out(10L)._2 === 100L, "both regions covered in full")
    assert(out(10L)._3 === md5hex(midB.mkString(" ")),
      "stripped text must be exactly the uncovered middle tokens, in order")
    // untouched doc: strip is the identity
    assert(out(13L) === ((60L, 0L, md5hex(doc3))))
  }

  test("dedup_substring_strip_text agrees with dedup_substring_strip's counts") {
    val overlap = cutFreeRun("stt", 55)
    val doc1 = ((1 to 20).map(i => s"pre_m$i") ++ overlap).mkString(" ")
    val doc2 = (overlap ++ (1 to 20).map(i => s"suf_m$i")).mkString(" ")
    val docs = docsFrame(Seq(21L -> doc1, 22L -> doc2))
    val report = operators.Cdc.dedupSubstringStripOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val text = operators.Cdc.dedupSubstringStripTextOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(report === text, "the two strip surfaces share one removal set")
  }

  test("dedup_substring_incremental: delta probes the stored index, base never re-hashed") {
    val run = cutFreeRun("inc", 55) // 55-token run = 6 windows per carrier
    val base = docsFrame(Seq(
      1L -> ((1 to 20).map(i => s"b1_$i") ++ run).mkString(" "),
      2L -> (run ++ (1 to 20).map(i => s"b2_$i")).mkString(" "),
      3L -> (1 to 70).map(i => s"b3_$i").mkString(" ")))
    val idx = operators.Cdc.substrPostings(base)
    val delta = docsFrame(Seq(
      // shares the full 55-token run with base docs 1 AND 2
      8L -> ((1 to 5).map(i => s"d8_$i") ++ run).mkString(" "),
      // long but disjoint vocabulary: windows exist, none match
      9L -> (1 to 60).map(i => s"d9_$i").mkString(" "),
      // below the window length: no windows at all
      18L -> (1 to 10).map(i => s"d18_$i").mkString(" ")))
    val out = operators.Cdc.dedupSubstringIncrementalOf(delta, idx).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 8: 6 shared windows with each of base 1 and 2; best = base 1
    // (equal n_shared, smaller id), est = 6 + 49 = 55 exact
    assert(out(8L).getLong(1) === 11L, "5 prefix-crossing + 6 run windows")
    assert(out(8L).getLong(2) === 2L, "two base docs matched")
    assert(out(8L).getLong(3) === 1L, "ties go to the smallest base id")
    assert(out(8L).getLong(4) === 6L)
    assert(out(8L).getLong(5) === 55L, "exact overlap length on a contiguous run")
    assert(!out(8L).getBoolean(6), "a matched delta doc must not be kept")
    // doc 9: windowed but clean — kept
    assert(out(9L).getLong(1) === 11L && out(9L).getLong(2) === 0L)
    assert(out(9L).getBoolean(6))
    // doc 18: too short to window — kept, zero windows
    assert(out(18L).getLong(1) === 0L && out(18L).getBoolean(6))
  }

  test("dedup_substring_strip_incremental: delta text cleaned against the base index") {
    val run = cutFreeRun("sic", 55) // 55 tokens = 6 windows per carrier
    val base = docsFrame(Seq(
      1L -> ((1 to 20).map(i => s"sb1_$i") ++ run).mkString(" ")))
    val idx = operators.Cdc.substrPostings(base)
    val tailToks = (1 to 10).map(i => s"sd8_$i")
    val delta = docsFrame(Seq(
      // the full run + its own tail: the covered 55 positions strip,
      // the tail survives verbatim
      8L -> (run ++ tailToks).mkString(" "),
      // clean long doc: identity strip
      9L -> (1 to 60).map(i => s"sd9_$i").mkString(" "),
      // below the window length: untouched
      18L -> (1 to 10).map(i => s"sd18_$i").mkString(" ")))
    val out = operators.Cdc.dedupSubstringStripIncrementalOf(delta, idx)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 8: positions 0..54 covered (6 base-shared windows, unioned);
    // the EXACT surviving text is its 10 tail tokens
    assert(out(8L)._1 === 65L)
    assert(out(8L)._2 === 55L, "the full shared run strips, nothing more")
    assert(out(8L)._3 === md5hex(tailToks.mkString(" ")))
    assert(out(9L) === ((60L, 0L,
      md5hex((1 to 60).map(i => s"sd9_$i").mkString(" ")))))
    assert(out(18L) === ((10L, 0L,
      md5hex((1 to 10).map(i => s"sd18_$i").mkString(" ")))))
  }
}
