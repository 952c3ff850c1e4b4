package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking invariants: lossless segmentation, the
  * shift-robustness property that motivates CDC over fixed-size
  * chunking, and the dedup report's gates.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("chunks reconstruct every document exactly (lossless segmentation)") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf)
    val bad = Cdc
      .chunkFrame(docs)
      .groupBy(col("doc_id"))
      // collect_list order is arrival order, so sort by the chunk's
      // word offset before rebuilding — offset order must give back
      // the original byte-for-byte.
      .agg(
        concat_ws(
          " ",
          expr("transform(sort_array(collect_list(struct(start, chunk))), p -> p.chunk)"))
          .as("rebuilt"))
      .join(docs, "doc_id")
      .filter(col("rebuilt") =!= col("text"))
      .count()
    assert(bad === 0L)
  }

  test("boundaries re-synchronize after a prefix edit (shift-robustness)") {
    import spark.implicits._
    val docs = Tables
      .documents(spark, TestSpark.Sf)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"))
    val shifted = docs.select(
      col("doc_id"),
      concat(lit("inserted prefix words "), col("text")).as("text"))
    val origChunks = Cdc
      .chunkFrame(docs)
      .select(col("doc_id"), col("chunk_md5"))
    val shiftChunks = Cdc
      .chunkFrame(shifted)
      .select(col("doc_id"), col("chunk_md5"))
    val orig   = origChunks.count()
    val shared = origChunks.intersect(shiftChunks).count()
    // Fixed-size chunking would share ~zero chunks after a 3-word
    // prefix insertion; content-defined boundaries re-sync at the next
    // matching hash window, so most chunks survive. >= 40% is far above
    // anything a shifted fixed grid could produce while robust to the
    // docs whose first boundary sits late.
    assert(orig > 0L)
    assert(shared.toDouble / orig >= 0.4,
      s"only $shared of $orig chunks survived a prefix edit")
  }

  test("chunking is deterministic across runs") {
    val a = Cdc
      .chunkFrame(Tables.documents(spark, TestSpark.Sf))
      .select("doc_id", "chunk_md5")
      .collect()
      .map(_.toSeq)
      .sortBy(_.toString)
    val b = Cdc
      .chunkFrame(Tables.documents(spark, TestSpark.Sf))
      .select("doc_id", "chunk_md5")
      .collect()
      .map(_.toSeq)
      .sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("dedup report gates: every row duplicated and above the size floor") {
    val rows = Cdc.cdcChunkDedup(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_total") >= 2L)
      assert(r.getAs[Long]("chunk_words") >= 4L)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_total"))
    }
  }

  test("dup_spans merges an injected shared run into one maximal span") {
    import spark.implicits._
    // Two docs sharing an exact 60-word middle run under different
    // prefixes/suffixes. The boundary rule is deterministic: the run
    // "shared1..shared60" has internal cuts at run-relative word
    // positions 3, 32, 47 (md5 windows fully inside the run, so
    // identical in both docs), giving two fully-shared ADJACENT chunks
    // of 29 and 15 words; edge chunks blend with the differing context
    // and are not shared. The island merge must fuse the two into one
    // 44-word span starting at prefix+3 in each doc.
    val run    = (1 to 60).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (0L, s"alpha beta gamma delta $run tail1 tail2"),
      (1L, s"one two $run other words here")).toDF("doc_id", "text")
    val spans = Cdc.dupSpansFrame(docs).collect()
    assert(spans.length === 1, s"expected one span, got ${spans.toSeq}")
    val s = spans.head
    assert(s.getAs[Long]("doc_a") === 0L)
    assert(s.getAs[Long]("doc_b") === 1L)
    assert(s.getAs[Long]("span_words") === 44L)
    assert(s.getAs[Long]("n_chunks") === 2L)
    assert(s.getAs[Long]("start_a") === 7L) // 4-word prefix + 3
    assert(s.getAs[Long]("start_b") === 5L) // 2-word prefix + 3
  }

  test("identical documents collapse to one whole-document span") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
    val spans = Cdc.dupSpansFrame(docs).collect()
    assert(spans.length === 1)
    val s = spans.head
    assert(s.getAs[Long]("start_a") === 0L)
    assert(s.getAs[Long]("start_b") === 0L)
    assert(s.getAs[Long]("span_words") === 40L)
  }

  /** Reference chunker: the documented boundary rule re-implemented
    * independently of Spark (JDK MessageDigest md5, plain Scala) —
    * boundary after word i (1-based, i >= 2) iff md5(w_{i-1} + " " +
    * w_i) starts with hex '0'.
    */
  private def referenceChunks(text: String): Seq[(Int, String)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val w = text.split(" ", -1)
    val cuts = (2 to w.length).filter(i => md5hex(w(i - 2) + " " + w(i - 1)).startsWith("0"))
    val cs = (0 +: cuts :+ w.length).distinct
    cs.sliding(2).collect {
      case Seq(s, e) if e > s => (s, w.slice(s, e).mkString(" "))
    }.toSeq
  }

  test("property: Spark chunker matches the independent reference on random texts") {
    import spark.implicits._
    val word: Gen[String] =
      Gen.frequency(
        8 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10)),
        1 -> Gen.const(""), // consecutive/edge spaces survive split(-1)
        1 -> Gen.oneOf("the", "a", "data", "row")) // force repeats
    val text: Gen[String] =
      Gen.chooseNum(0, 80).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docs = (1 to 60).flatMap { i =>
      text.apply(Gen.Parameters.default, Seed(i.toLong)).map(t => (i.toLong, t))
    }
    val got = Cdc
      .chunkFrame(docs.toDF("doc_id", "text"))
      .select("doc_id", "start", "chunk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getString(2)))
      .groupBy(_._1)
      .view.mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq)
      .toMap
    docs.foreach { case (id, t) =>
      val expect = referenceChunks(t)
      assert(got.getOrElse(id, Nil) === expect, s"doc $id text='$t'")
    }
  }

  test("incremental ingest report is internally consistent and store-backed") {
    val r1 = Cdc.cdcIncremental(spark, TestSpark.Sf).collect().head
    val distinct = r1.getAs[Long]("delta_distinct_chunks")
    val total    = r1.getAs[Long]("delta_chunks")
    val newC     = r1.getAs[Long]("new_chunks")
    val dupOcc   = r1.getAs[Long]("dup_chunk_occurrences")
    assert(distinct <= total)
    assert(newC <= distinct)
    // every occurrence is either of a new hash or an already-stored one
    assert(dupOcc <= total - newC || newC == distinct)
    assert(r1.getAs[Long]("bytes_written") <= r1.getAs[Long]("bytes_ingested"))
    // the driver corpus contains cross-split near-dups, so SOME delta
    // chunks must already be in the store
    assert(dupOcc > 0L)
    // second run reuses the stored chunk store (same values, no rebuild)
    val r2 = Cdc.cdcIncremental(spark, TestSpark.Sf).collect().head
    assert(r1.toSeq === r2.toSeq)
  }

  test("split contamination report: one row per eval split, rates well-formed") {
    val rows = Cdc.splitContamination(spark, TestSpark.Sf).collect()
    assert(rows.map(_.getAs[String]("split")).toSeq === Seq("test", "val"))
    rows.foreach { r =>
      assert(r.getAs[Long]("contaminated_chunks") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("docs_affected") <= r.getAs[Long]("n_docs"))
      val cr = r.getAs[Double]("chunk_contamination_rate")
      val dr = r.getAs[Double]("doc_contamination_rate")
      assert(cr >= 0.0 && cr <= 1.0)
      assert(dr >= 0.0 && dr <= 1.0)
      // a doc is affected iff one of its chunks is contaminated, so the
      // corpus's cross-split near-dups must surface in BOTH measures
      assert((cr > 0.0) === (dr > 0.0))
    }
  }

  test("plan: chunk TEXT never reaches a shuffle (hash-only exchanges)") {
    import org.apache.spark.sql.classic.{Dataset => CDataset}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Seq("cdc_chunk_dedup", "cdc_dedup_ratio", "dup_spans", "split_contamination")
      .foreach { q =>
        val exec = SparkEntry.queries(q)(spark, TestSpark.Sf)
          .asInstanceOf[CDataset[Row]].queryExecution.executedPlan
        val shuffles = exec.collect { case e: ShuffleExchangeLike => e }
        assert(shuffles.nonEmpty, s"$q plan has no exchange to check")
        shuffles.foreach { e =>
          val cols = e.child.output.map(_.name)
          assert(!cols.contains("chunk") && !cols.contains("text") && !cols.contains("t"),
            s"$q shuffles raw text columns: $cols")
        }
      }
    finally spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
  }

  test("savings ratio is consistent with its own numerators") {
    val r = Cdc.cdcDedupRatio(spark, TestSpark.Sf).collect().head
    val total  = r.getAs[Long]("chunk_chars_total")
    val stored = r.getAs[Long]("chunk_chars_stored")
    assert(total >= stored)
    assert(r.getAs[Long]("total_chunks") >= r.getAs[Long]("distinct_chunks"))
    val expect = math.floor((1.0 - stored.toDouble / total) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("savings_ratio") === expect)
  }
}
