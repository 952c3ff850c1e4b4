package graft

import graft.operators.{Curation, TextAnalysis, TextNgrams}
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 corpus-analysis additions: topic tagging, language confusion,
  * PMI collocations, tokenizer fertility. Oracle hashes are the driver
  * gate's job; these prove the semantics the hash can't see — argmax
  * tie-breaks, crafted collocations, share algebra.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("topic_tagging: argmax, name-order tie-break, and 'other' fallback") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "scan filter join join"),   // exec only
      ("s1", "table row column scan"),   // storage 3 > exec 1
      ("s1", "scan fast"),               // exec/perf tie -> exec (name order)
      ("s1", "the a customer data"))     // zero keyword hits -> other
      .toDF("source", "text")
    val got = Curation
      .topicTaggingOf(docs)
      .collect()
      .map(r => r.getString(1) -> r.getLong(2))
      .toMap
    assert(got === Map("exec" -> 2L, "storage" -> 1L, "other" -> 1L))
  }

  test("topic_tagging: within-source shares sum to ~1") {
    val rows = SparkEntry.queries("topic_tagging")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows
      .groupBy(_.getString(0))
      .foreach { case (src, rs) =>
        val s = rs.map(_.getDouble(3)).sum
        assert(math.abs(s - 1.0) < 1e-3, s"$src shares sum to $s")
      }
  }

  test("lang_confusion: counts partition the corpus and shares sum per label") {
    val rows = SparkEntry.queries("lang_confusion")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(2)).sum
    val docs  = Tables.documents(spark, TestSpark.Sf).count()
    assert(total === docs, s"confusion cells cover $total of $docs docs")
    rows
      .groupBy(_.getString(0))
      .foreach { case (lang, rs) =>
        val s = rs.map(_.getDouble(3)).sum
        assert(math.abs(s - 1.0) < 1e-3, s"$lang shares sum to $s")
      }
  }

  test("pmi_bigrams: a crafted always-together pair outranks independent fill") {
    import spark.implicits._
    // "new york" co-occurs 8 times and nowhere else; filler words are
    // shuffled independently, so their pairwise PMI ~ 0
    val fill = Seq("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0 until 8)
      .map { i =>
        val rot = fill.drop(i % fill.size) ++ fill.take(i % fill.size)
        (rot.take(3) :+ "new" :+ "york").++(rot.drop(3)).mkString(" ")
      }
      .toDF("text")
    val top = TextNgrams.pmiBigramsOf(docs).collect()
    assert(top.nonEmpty)
    val first = top.head
    assert(first.getString(1) === "new" && first.getString(2) === "york",
      s"expected (new, york) on top, got $first")
  }

  test("pmi_bigrams: ranked, floored, monotone") {
    val rows = SparkEntry.queries("pmi_bigrams")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length), "rn not dense")
    rows.foreach(r => assert(r.getLong(3) >= 5, s"count floor violated: $r"))
    val pmis = rows.map(_.getDouble(6)).toSeq
    assert(pmis === pmis.sorted.reverse, "pmi not descending in rank order")
  }

  test("tokenizer_fertility: per-lang accounting is coherent") {
    val rows =
      SparkEntry.queries("tokenizer_fertility")(spark, TestSpark.Sf).collect()
    assert(rows.map(_.getString(0)).toSet.size === rows.length, "dup lang rows")
    rows.foreach { r =>
      val (nw, nc, nt) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nw > 0 && nt >= nw, s"fewer tokens than words: $r")
      assert(nt <= nc, s"more tokens than chars: $r")
      val tpw = r.getDouble(4)
      val cpt = r.getDouble(5)
      assert(tpw >= 1.0 && cpt >= 1.0, s"fertility ratios out of range: $r")
    }
  }
}
