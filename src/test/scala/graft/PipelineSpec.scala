package graft

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-4 pipeline tier. The value-exactness of
  * every query is covered by the DuckDB oracle gate; these specs assert
  * the properties the oracle can't see — chunk coverage geometry, the
  * Bloom filter's no-false-negative contract and its pruning rate, the
  * incremental merge's equivalence to a full recompute, and split/shard
  * stability under corpus growth.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("doc_chunks covers every token exactly: windows tile [0, n) with stride overlap") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val chunks = Pipeline.docChunks(spark, sf)
    val perDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("nc"),
      max(col("chunk_start") + col("n_tokens")).as("covered"),
      min(col("chunk_start")).as("first_start"))
    val joined = perDoc.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nc, covered, firstStart, n) =
        (r.getAs[Long]("nc"), r.getAs[Long]("covered"),
          r.getAs[Long]("first_start"), r.getAs[Long]("n"))
      assert(firstStart == 0L, s"doc ${r.get(0)}: first chunk must start at 0")
      assert(covered == n, s"doc ${r.get(0)}: chunks cover $covered of $n tokens")
      // stride 24 < window 32 ⇒ consecutive windows overlap; count formula
      val expected = if (n <= 32) 1L else ((n - 32 + 23) / 24) + 1
      assert(nc == expected, s"doc ${r.get(0)}: $nc chunks, expected $expected for n=$n")
    }
  }

  test("bloom prefilter: no false negatives, and it prunes most of the fact table") {
    val orders = Tables.orders(spark, sf)
      .filter(col("o_orderdate").between("1995-01-01", "1995-03-31"))
    val bloom = orders
      .select(
        xxhash64(col("o_orderkey")).as("h1"),
        xxhash64(lit("graft-bloom"), col("o_orderkey")).as("h2"))
      .agg(graft.functions.BloomBits
        .udf(Pipeline.BloomNumBits, Pipeline.BloomNumHashes)(col("h1"), col("h2"))
        .as("bits"))
    val li = Tables.lineitem(spark, sf)
      .withColumn("h1", xxhash64(col("l_orderkey")))
      .withColumn("h2", xxhash64(lit("graft-bloom"), col("l_orderkey")))
      .crossJoin(broadcast(bloom))
    val total    = li.count()
    val accepted = li.filter(Pipeline.bloomMightContain("bits", "h1", "h2")).count()
    val trueHits = Tables.lineitem(spark, sf)
      .join(orders.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(trueHits > 0, "fixture must have matching lineitems")
    // no false negatives: every true match passes the filter
    assert(accepted >= trueHits, s"bloom dropped true matches: $accepted < $trueHits")
    // and the filter actually prunes (FPR at this load is ~1e-6)
    assert(accepted < total / 2, s"bloom pruned nothing: $accepted of $total")
  }

  test("incremental_agg_merge equals a one-shot full recompute, bit for bit") {
    val merged = Pipeline.incrementalAggMerge(spark, sf)
      .select("user_id", "n_events", "total_value")
    val full = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Det.Money)).cast("double").as("total_value"))
      .orderBy(col("user_id"))
    assert(merged.collect().map(_.toSeq).toSeq == full.collect().map(_.toSeq).toSeq)
    // the split is visible and consistent
    val parts = Pipeline.incrementalAggMerge(spark, sf)
      .select((col("n_events_old") + col("n_events_new")) === col("n_events"))
      .collect()
    assert(parts.forall(_.getBoolean(0)))
  }

  test("dataset_split is stable under corpus growth: doc assignment ignores neighbors") {
    // A document's split depends only on md5("split:" || doc_id), so the
    // same doc must land in the same split when computed over any subset.
    val h = md5(concat(lit("split:"), col("doc_id").cast("string")))
    val assign = Tables.documents(spark, sf)
      .select(col("doc_id"), substring(h, 1, 1).as("hd"))
      .withColumn("split",
        when(col("hd") <= "b", "train").when(col("hd") <= "d", "val").otherwise("test"))
    val all  = assign.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val half = assign.filter(col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(half.nonEmpty && half.forall { case (id, s) => all(id) == s })
    // rollup shares sum to 1 per language
    val shares = Pipeline.datasetSplit(spark, sf)
      .groupBy("lang").agg(sum("share").as("s")).collect()
    shares.foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-4))
  }

  test("corpus_shuffle is a permutation with dense shard positions") {
    val out = Pipeline.corpusShuffle(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
    // positions within each shard are 0..size-1 (dense, no gaps)
    out.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps.zipWithIndex.forall { case (p, i) => p == i.toLong })
    }
    // every shard except the last is exactly full
    val sizes = out.groupBy(_.getAs[Long]("shard")).toSeq.sortBy(_._1).map(_._2.length)
    assert(sizes.init.forall(_ == 64) && sizes.last <= 64)
  }

  test("dedup_keep_best keeps exactly one canonical doc per cluster") {
    val clusters = Dedup.dedupClusters(spark, sf)
    val kept     = Dedup.dedupKeepBest(spark, sf).collect()
    val nClusters = clusters.select("cluster_id").distinct().count()
    assert(kept.length == nClusters)
    // the kept doc is a member, and no member is longer
    val members = clusters
      .join(Tables.documents(spark, sf).select("doc_id", "n_chars"), "doc_id")
      .collect()
      .groupBy(_.getAs[Long]("cluster_id"))
    kept.foreach { r =>
      val cl   = members(r.getAs[Long]("cluster_id"))
      val best = r.getAs[Long]("kept_doc")
      assert(cl.exists(_.getAs[Long]("doc_id") == best))
      assert(r.getAs[Long]("n_members") == cl.length)
      assert(cl.forall(_.getAs[Long]("n_chars") <= r.getAs[Long]("kept_chars")))
    }
  }

  test("scd2_history: per-key versions chain without gaps, one current version each") {
    val hist = Pipeline.scd2History(spark, sf).collect()
    assert(hist.nonEmpty)
    hist.groupBy(_.getAs[Long]("custkey")).foreach { case (ck, vs) =>
      // exactly one open version
      assert(vs.count(_.getAs[Boolean]("is_current")) == 1, s"custkey $ck")
      // versions chain: each closed version's valid_to is some version's valid_from
      val froms = vs.map(_.getAs[String]("valid_from")).toSet
      vs.filter(!_.getAs[Boolean]("is_current")).foreach { v =>
        assert(froms.contains(v.getAs[String]("valid_to")), s"custkey $ck: torn chain")
      }
      // the open version starts last: no closed version begins after it
      val openFrom = vs.find(_.getAs[Boolean]("is_current")).get.getAs[String]("valid_from")
      assert(vs.forall(_.getAs[String]("valid_from") <= openFrom), s"custkey $ck")
    }
  }

  test("temporal_split: both splits populated, overlap bounded, events conserved") {
    val rows = Pipeline.temporalSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("train", "eval"))
    val total = rows.values.map(_.getLong(1)).sum
    assert(total === Tables.events(spark, sf).count(), "splits must partition events")
    rows.values.foreach { r =>
      val (nEvents, nUsers, nOverlap, leak) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nEvents > 0 && nUsers > 0, s"empty split: $r")
      assert(nOverlap <= nUsers, s"overlap exceeds split's user count: $r")
      assert(leak >= 0.0 && leak <= 1.0, s"leakage rate out of range: $r")
    }
    // the 80% cutoff must put the bulk of events in train
    assert(rows("train").getLong(1) > rows("eval").getLong(1),
      "train split should dominate an 80%-of-span cutoff")
  }

  test("boilerplate_ngrams: every reported shingle really occurs in >= 3 distinct docs") {
    val out = Pipeline.boilerplateNgrams(spark, sf).collect()
    if (out.nonEmpty) {
      assert(out.forall(_.getAs[Long]("n_docs") >= 3))
      assert(out.forall(r => r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_docs")))
      assert(out.forall(_.getAs[String]("s").split(" ").length == 8))
    }
  }

  test("boilerplate_strip matches a brute-force interval-union recompute") {
    val out = Pipeline.boilerplateStrip(spark, sf).collect()
      .map(r => Option(r.getAs[String]("source")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_docs_hit"),
          r.getAs[Long]("tokens_total"), r.getAs[Long]("tokens_removed")))
      .toMap
    assert(out.nonEmpty)
    // brute force on the collected sf0.001 corpus: same top-100 boiler
    // set, covered = UNION of [pos, pos+8) spans (overlaps not double-
    // counted), aggregated per source
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), Option(r.getAs[String]("source")),
        Option(r.getAs[String]("text"))))
    val toks = docs.map { case (id, src, txt) =>
      (id, src, txt.map(_.split(" ", -1).toSeq)) }
    val occ = toks.flatMap { case (id, _, t) =>
      t.toSeq.flatMap(ts =>
        if (ts.size < 8) Nil
        else (0 to ts.size - 8).map(i => (id, i, ts.slice(i, i + 8).mkString(" "))))
    }
    val boiler = occ.groupBy(_._3).view
      .mapValues(os => (os.map(_._1).distinct.size.toLong, os.size.toLong))
      .filter(_._2._1 >= 3L).toSeq
      .sortBy { case (s, (nd, no)) => (-nd, -no, s) }
      .take(100).map(_._1).toSet
    val removedByDoc = occ.filter(o => boiler(o._3))
      .groupBy(_._1).view
      .mapValues(_.flatMap(o => o._2 until o._2 + 8).distinct.size.toLong).toMap
    val expected = toks.groupBy(_._2).view.mapValues { ds =>
      val nDocs    = ds.size.toLong
      val hit      = ds.count(d => removedByDoc.getOrElse(d._1, 0L) > 0L).toLong
      val total    = ds.flatMap(_._3.map(_.size.toLong)).sum
      val removed  = ds.map(d => removedByDoc.getOrElse(d._1, 0L)).sum
      (nDocs, hit, total, removed)
    }.toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (src, exp) =>
      assert(out(src) === exp, s"source $src: got ${out(src)}, expected $exp")
    }
    // the fixture must actually exercise overlap (some doc where raw
    // 8x hit count exceeds the union) or the no-double-count branch is dead
    val overlapped = occ.filter(o => boiler(o._3)).groupBy(_._1).exists {
      case (id, os) => os.size * 8L > removedByDoc(id)
    }
    assert(overlapped, "fixture never exercises overlapping boilerplate spans")
  }
}
