package graft

import java.nio.file.Files

import graft.streaming.DocStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup filter: later arrivals that minhash-match an
  * earlier doc are flagged with the ORIGINAL's id; fresh content passes
  * through unflagged; in-batch duplicates resolve deterministically to
  * the lower doc_id.
  */
class DocStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val originals = Seq(
    1L -> "the quick brown fox jumps over the lazy dog near the quiet river bank today",
    2L -> "distributed query engines shuffle data between executors when keys must colocate",
    3L -> "a language model trained on curated text generalizes better than one on raw crawl")

  // 11/12/13 are one-word edits of 1/2/3; 14 is new; 15/16 are
  // near-identical to each other (in-batch pair), unrelated to file 1
  private val second = Seq(
    11L -> "the quick brown fox jumps over the lazy cat near the quiet river bank today",
    12L -> "distributed query engines shuffle data between workers when keys must colocate",
    13L -> "a language model trained on curated text generalizes better than one on raw data",
    14L -> "completely different content about cooking pasta with garlic butter and fresh basil leaves",
    15L -> "streaming systems flag duplicate documents before they ever reach the storage layer",
    16L -> "streaming systems flag duplicate documents before they ever reach the archive layer")

  test("stream_dedup_ingest micro-batch union equals the batch incremental verdicts") {
    // the registered streaming ingest run (4-file AvailableNow stream,
    // multiple foreachBatch probes) must produce exactly the batch
    // query's table — per-delta-row independence is the contract that
    // makes the shared oracle valid
    val streamed = DocStreams.streamDedupIngest(spark, TestSpark.Sf).collect()
    val batch    = graft.operators.Dedup.dedupIncremental(spark, TestSpark.Sf).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString).toSeq === batch.map(_.toString).toSeq,
      "streamed verdicts diverge from the batch incremental path")
  }

  test("stream flags later near-copies against first-seen originals") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-docstream").toFile
    dir.deleteOnExit()
    originals.toDF("doc_id", "text").coalesce(1)
      .write.parquet(dir.getAbsolutePath + "/src/f1")
    second.toDF("doc_id", "text").coalesce(1)
      .write.parquet(dir.getAbsolutePath + "/src/f2")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q = DocStreams.nearDupFilter(stream)
      .writeStream.format("memory").queryName("dup_hits")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // a doc can hit in several buckets: resolve per doc to the best hit
    val hits = spark.sql("SELECT * FROM dup_hits")
      .groupBy("doc_id")
      .agg(max(struct(col("est_jaccard"), col("dup_of"))).as("m"))
      .select(col("doc_id"), col("m.dup_of"), col("m.est_jaccard"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // the three edits flag their originals
    assert(hits.contains(11L) && hits(11L)._1 === 1L, s"$hits")
    assert(hits.contains(12L) && hits(12L)._1 === 2L, s"$hits")
    assert(hits.contains(13L) && hits(13L)._1 === 3L, s"$hits")
    // fresh content passes
    assert(!hits.contains(14L))
    // in-batch pair: lower doc_id wins as original
    assert(!hits.contains(15L))
    assert(hits.contains(16L) && hits(16L)._1 === 15L, s"$hits")
    // nothing from the first file is ever flagged
    assert(originals.map(_._1).forall(id => !hits.contains(id)))
    // every flagged pair is a TRUE near-dup by the batch estimator
    hits.values.foreach { case (_, est) => assert(est >= 0.5) }
  }

  test("stream_mix_ingest: planned sources repeat, unplanned sources get zero") {
    // base slice (ids % 10 < 8) is all source A; delta doc 18 arrives
    // with UNSEEN source B → planned=false, repeats=0; delta doc 19
    // (source A) gets floor(epochs) or floor+1 — never negative, never
    // above the MaxEpochs ceiling
    val dir = Files.createTempDirectory("graft-smix").toString
    import spark.implicits._
    val rows =
      (0L to 7L).map(i => (i, "A", s"base doc $i " + ("tok " * 20).trim)) ++
        Seq(
          (18L, "B", "an unplanned source arrives mid stream with fresh text"),
          (19L, "A", "a planned source doc that the schedule covers today"))
    rows.toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DocStreams.streamMixIngest(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.keySet === Set(18L, 19L))
    assert(out(18L) === ((0L, false)), "unseen source must be flagged unplanned with 0 repeats")
    val (rep19, planned19) = out(19L)
    assert(planned19, "source A is in the base plan")
    assert(rep19 >= 1L && rep19 <= 8L, s"repeats $rep19 outside [1, MaxEpochs]")
    // determinism: a second run serves byte-identical rows
    val again = DocStreams.streamMixIngest(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(again === out)
  }

  test("stream_quality_gate: micro-batched verdicts equal the batch gate") {
    val out = graft.streaming.DocStreams
      .streamQualityGate(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    // batch recompute: base-slice thresholds, delta-slice verdicts
    val docs = Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), Option(r.getAs[String]("lang")),
        Option(r.getAs[String]("text"))))
    def scoreOf(t: Option[String]): Option[Double] = t.map { s =>
      val toks = s.split(" ", -1)
      toks.distinct.length.toDouble / toks.length
    }
    val thr = docs.filter(_._1 % 10 < 8).groupBy(_._2).collect {
      case (Some(lang), ds) if ds.count(_ => true) >= 2 =>
        val sc = ds.flatMap(d => scoreOf(d._3))
        // spec-side recompute uses plain double sums: assert verdicts,
        // not the 6-dp threshold bits (the DuckDB oracle covers those)
        val n = ds.size.toDouble
        val s1 = sc.sum; val s2 = sc.map(x => x * x).sum
        val sd = math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1), 0.0))
        lang -> (s1 / n - sd)
    }.toMap
    val expected = docs.filter(_._1 % 10 >= 8).map { case (id, lang, text) =>
      val t = lang.flatMap(thr.get)
      val s = scoreOf(text)
      val keep = !(s.isDefined && t.isDefined && s.get < t.get)
      id -> keep
    }.toMap
    assert(out.length === expected.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("keep") === expected(id), s"doc $id verdict diverges")
    }
    // the gate must be observably load-bearing: some doc dropped, some kept
    assert(out.exists(!_.getAs[Boolean]("keep")), "gate never drops on the fixture")
    assert(out.exists(_.getAs[Boolean]("keep")))
  }
}
