package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Structured Streaming: the same transforms must produce the batch
  * answer when driven through a file-source stream.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def streamedCounts(): Array[(String, Long)] = {
    // copy events.parquet into a temp dir to act as a file-source stream
    val dir = Files.createTempDirectory("graft-stream").toFile
    dir.deleteOnExit()
    val batch = Tables.events(spark, TestSpark.Sf)
    batch.write.mode("overwrite").parquet(dir.getAbsolutePath)

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(dir.getAbsolutePath)
    val q = EventStreams
      .tumblingCounts(stream, "1 day", "0 seconds")
      .select(col("window.start").as("ws"), col("event_type"), col("n_events"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.sql("SELECT event_type, sum(n_events) FROM stream_counts GROUP BY 1 ORDER BY 1")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
  }

  test("streaming tumbling counts equal the batch result") {
    val streamed = streamedCounts()
    val batch = EventStreams
      .tumblingCounts(Tables.events(spark, TestSpark.Sf), "1 day", "0 seconds")
      .groupBy("event_type")
      .agg(sum("n_events").as("n"))
      .orderBy("event_type")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("flatMapGroupsWithState carries running totals across micro-batches") {
    val dir = Files.createTempDirectory("graft-stream-state").toFile
    dir.deleteOnExit()
    val batch = Tables.events(spark, TestSpark.Sf)
    // two files → with maxFilesPerTrigger=1, two micro-batches
    val Array(h1, h2) = batch.randomSplit(Array(0.5, 0.5), seed = 42)
    h1.coalesce(1).write.parquet(dir.getAbsolutePath + "/f1")
    h2.coalesce(1).write.parquet(dir.getAbsolutePath + "/f2")
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/f*")
    val q = EventStreams
      .runningUserTotals(stream)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("running_totals")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // the LAST update per user must equal the batch totals
    val finalTotals = spark
      .sql("SELECT user_id, max(n_events) AS n FROM running_totals GROUP BY 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = batch.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(finalTotals === expected)
    // more than one batch actually ran (state was exercised)
    val updates = spark.sql("SELECT count(*) FROM running_totals").collect().head.getLong(0)
    assert(updates > expected.size, "expected multiple micro-batch updates")
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    val dir = Files.createTempDirectory("graft-stream-dedup").toFile
    dir.deleteOnExit()
    val batch = Tables.events(spark, TestSpark.Sf).limit(200).cache()
    // deliver the same 200 events twice (two files → duplicated stream)
    batch.coalesce(1).write.parquet(dir.getAbsolutePath + "/f1")
    batch.coalesce(1).write.parquet(dir.getAbsolutePath + "/f2")
    val stream = spark.readStream.schema(batch.schema).parquet(dir.getAbsolutePath + "/f*")
    val q = EventStreams
      .dedupedStream(stream, "1 hour")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("deduped_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.sql("SELECT count(DISTINCT event_id), count(*) FROM deduped_stream")
      .collect().head
    assert(n.getLong(0) === 200L, "all distinct events must survive")
    assert(n.getLong(1) === 200L, s"duplicates must be dropped, got ${n.getLong(1)}")
    batch.unpersist()
  }

  test("event-time timeout closes per-day sessions once the watermark passes") {
    val dir = Files.createTempDirectory("graft-stream-timeout").toFile
    dir.deleteOnExit()
    val raw = Tables.events(spark, TestSpark.Sf)
    // time-split into two micro-batch files: early 45 days, then the rest
    val minTs = raw.agg(min(col("ts"))).collect().head.getLong(0)
    val cutoff = minTs + 45L * 86400 * 1000000L // ts is epoch-µs
    raw.filter(col("ts") < cutoff).coalesce(1)
      .write.parquet(dir.getAbsolutePath + "/src/f1")
    raw.filter(col("ts") >= cutoff).coalesce(1)
      .write.parquet(dir.getAbsolutePath + "/src/f2")
    val stream = spark.readStream
      .schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q = EventStreams
      .dailySessionsWithTimeout(stream, "0 seconds", gapMs = 3600L * 1000)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("closed_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val closed = spark.sql("SELECT user_id, day, n_events FROM closed_sessions")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val early = EventStreams.withEventTime(raw.filter(col("ts") < cutoff))
      .groupBy(col("user_id"), date_format(col("event_time"), "yyyy-MM-dd").as("day"))
      .count()
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    // every closed session must exactly match the early-file counts
    assert(closed.nonEmpty, "watermark advance must have closed sessions")
    closed.foreach { case (k, n) =>
      assert(early.contains(k), s"closed session $k not from the early file")
      assert(early(k) === n, s"closed count mismatch for $k")
    }
    // all early days except possibly the boundary day must have closed
    val lastEarlyDay = early.keys.map(_._2).max
    early.keys.filter(_._2 < lastEarlyDay).foreach { k =>
      assert(closed.contains(k), s"early session $k should have timed out")
    }
  }

  test("native session windows close identically in stream and batch") {
    val dir = Files.createTempDirectory("graft-stream-sesswin").toFile
    dir.deleteOnExit()
    val raw = Tables.events(spark, TestSpark.Sf)
    val minTs  = raw.agg(min(col("ts"))).collect().head.getLong(0)
    val cutoff = minTs + 45L * 86400 * 1000000L // ts is epoch-µs
    raw.filter(col("ts") < cutoff).coalesce(1)
      .write.parquet(dir.getAbsolutePath + "/src/f1")
    raw.filter(col("ts") >= cutoff).coalesce(1)
      .write.parquet(dir.getAbsolutePath + "/src/f2")
    def prep(df: org.apache.spark.sql.DataFrame) = df.select(
      col("user_id"),
      expr("timestamp_micros(ts)").as("t"),
      col("value"))
    val stream = spark.readStream
      .schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q = graft.operators.Engagement
      .sessionWindowAgg(prep(stream).withWatermark("t", "0 seconds"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("closed_session_windows")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val closed = spark.sql("SELECT * FROM closed_session_windows")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val batchAll = graft.operators.Engagement
      .sessionWindowAgg(prep(raw))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(closed.nonEmpty, "watermark advance must close sessions")
    // every closed streaming session is byte-identical to its batch twin
    closed.foreach { case (k, v) =>
      assert(batchAll.contains(k), s"streamed session $k unknown to batch")
      assert(batchAll(k) === v, s"session $k diverged: $v vs ${batchAll(k)}")
    }
  }

  test("foreachBatch incremental view converges to the batch aggregate") {
    val dir = Files.createTempDirectory("graft-stream-view").toFile
    dir.deleteOnExit()
    val viewDir = dir.getAbsolutePath + "/view"
    val batch = Tables.events(spark, TestSpark.Sf)
    val Array(h1, h2) = batch.randomSplit(Array(0.5, 0.5), seed = 7)
    h1.coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f1")
    h2.coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f2")
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q = EventStreams
      .incrementalUserTotals(stream, viewDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val view = EventStreams.currentView(spark, viewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = batch.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(view === expected)
    // Replay: restarting the same source without a checkpoint re-delivers
    // batchIds 0..1 (foreachBatch is at-least-once). The sidecar
    // batch-commit guard must skip them — the view must NOT double-count.
    assert(EventStreams.lastCommittedBatch(viewDir) === 1L)
    val replay = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q2 = EventStreams
      .incrementalUserTotals(replay, viewDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val replayed = EventStreams.currentView(spark, viewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(replayed === expected, "replayed micro-batches were re-merged")
  }

  test("checkpointed restart resumes from committed offsets, not zero") {
    val dir = Files.createTempDirectory("graft-stream-ckpt").toFile
    dir.deleteOnExit()
    val viewDir = dir.getAbsolutePath + "/view"
    val ckpt    = dir.getAbsolutePath + "/ckpt"
    val batch = Tables.events(spark, TestSpark.Sf)
    val Array(h1, h2) = batch.randomSplit(Array(0.5, 0.5), seed = 11)
    h1.coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f1")
    def start() = EventStreams
      .incrementalUserTotals(
        spark.readStream.schema(batch.schema)
          .parquet(dir.getAbsolutePath + "/src/f*"),
        viewDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    val q1 = start(); q1.awaitTermination(120000)
    assert(EventStreams.lastCommittedBatch(viewDir) === 0L)
    // second file lands AFTER the first run committed its offsets
    h2.coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f2")
    val q2 = start(); q2.awaitTermination(120000)
    // a checkpointed restart continues the batchId sequence (1, not a
    // replayed 0) — f1 is NOT re-read, f2 is merged exactly once
    assert(EventStreams.lastCommittedBatch(viewDir) === 1L)
    // only the committed version exists — superseded v=0 was pruned
    assert(new java.io.File(viewDir).listFiles()
      .count(_.getName.startsWith("v=")) === 1)
    val view = EventStreams.currentView(spark, viewDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = batch.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(view === expected, "checkpointed resume must converge exactly")
  }

  test("partitioned incremental view upserts only touched buckets") {
    val dir = Files.createTempDirectory("graft-stream-pview").toFile
    dir.deleteOnExit()
    val viewDir = dir.getAbsolutePath + "/view"
    val batch = Tables.events(spark, TestSpark.Sf)
    // f1 = broad traffic (many buckets), f2 = ONE user's events — the
    // second micro-batch must rewrite only that user's bucket
    val oneUser = batch.select(col("user_id")).limit(1)
      .collect().head.getLong(0)
    batch.filter(col("user_id") =!= oneUser)
      .coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f1")
    batch.filter(col("user_id") === oneUser)
      .coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f2")
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q = EventStreams
      .incrementalUserTotalsPartitioned(stream, viewDir, buckets = 16)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // converges to the batch aggregate (bucketing is layout, not truth)
    val view = spark.read.parquet(viewDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toMap
    val expected = batch.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(view === expected)
    assert(EventStreams.lastCommittedBatch(viewDir) === 1L)
    // bucket-bounded upsert: batch 1 (one user) must leave every other
    // bucket's files untouched — same parquet files, same timestamps
    val bktDirs = new java.io.File(viewDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
    assert(bktDirs.length > 2, "fixture should span many buckets")
    val hotBkt = "bkt=" + spark.range(1)
      .select(pmod(hash(lit(oneUser)), lit(16))).collect().head.getInt(0)
    // append the one-user file to the SAME source: a fresh (no-checkpoint)
    // query re-delivers f1/f2 as batches 0-1 (the guard must skip them)
    // and merges f3 as batch 2 — rewriting only hotBkt
    val before = bktDirs.map(d => d.getName ->
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet).toMap
    batch.filter(col("user_id") === oneUser)
      .coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f3")
    val stream2 = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q2 = EventStreams
      .incrementalUserTotalsPartitioned(stream2, viewDir, buckets = 16)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    val after = new java.io.File(viewDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bkt="))
      .map(d => d.getName ->
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    before.keys.filter(_ != hotBkt).foreach { b =>
      assert(after(b) === before(b), s"untouched bucket $b was rewritten")
    }
    assert(after(hotBkt) !== before(hotBkt), "hot bucket must be upserted")
    // and the double-merge is real this time (new batchId, not a replay):
    val hot = spark.read.parquet(viewDir)
      .filter(col("user_id") === oneUser)
      .collect().head.getAs[Long]("n_events")
    assert(hot === 2 * expected(oneUser), "second merge of the same rows")
  }

  test("stream-stream interval join matches the batch pair count") {
    val dir = Files.createTempDirectory("graft-stream-join").toFile
    dir.deleteOnExit()
    val batch = Tables.events(spark, TestSpark.Sf)
    batch.write.mode("overwrite").parquet(dir.getAbsolutePath)
    def side(t: String) = spark.readStream
      .schema(batch.schema)
      .parquet(dir.getAbsolutePath)
      .filter(col("event_type") === t)
    val q = EventStreams
      .viewClickPairs(side("view"), side("click"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("vc_pairs")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT count(*) FROM vc_pairs").collect().head.getLong(0)
    val expected = EventStreams
      .viewClickPairs(
        batch.filter(col("event_type") === "view"),
        batch.filter(col("event_type") === "click"))
      .count()
    assert(streamed === expected && expected > 0)
  }

  test("sliding windows in streaming mode count each event twice") {
    val dir = Files.createTempDirectory("graft-stream-slide").toFile
    dir.deleteOnExit()
    val batch = Tables.events(spark, TestSpark.Sf)
    batch.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batch.schema).parquet(dir.getAbsolutePath)
    val q = EventStreams
      .withEventTime(stream)
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_sliding")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val total = spark.sql("SELECT sum(n_events) FROM stream_sliding").collect().head.getLong(0)
    assert(total === 2 * batch.count())
  }

  test("session windows run in streaming mode with state") {
    val dir = Files.createTempDirectory("graft-stream-sess").toFile
    dir.deleteOnExit()
    val batch = Tables.events(spark, TestSpark.Sf)
    batch.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batch.schema).parquet(dir.getAbsolutePath)
    val q = EventStreams
      .sessionWindows(stream, "12 hours", "1 hour")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.sql("SELECT sum(n_events) FROM stream_sessions").collect().head.getLong(0)
    assert(n === batch.count())
  }

  test("manifest view: an empty first batch commits a readable empty view") {
    // batch 0 of a rate stream routinely carries zero rows — the commit
    // must still advance and readers must see an EMPTY view, not a
    // no-paths read crash
    val dir = Files.createTempDirectory("graft-manifest-empty").toFile
    dir.deleteOnExit()
    val viewDir = dir.getAbsolutePath + "/view"
    val none = Tables.events(spark, TestSpark.Sf).limit(0)
    EventStreams.mergeManifestBatch(none, viewDir, buckets = 8, batchId = 0)
    assert(EventStreams.readManifest(viewDir)._1 === 0)
    val view = EventStreams.manifestView(spark, viewDir)
    assert(view.count() === 0)
    assert(view.columns.toSeq ===
      Seq("user_id", "n_events", "total_value", "bkt"))
    // and the next (non-empty) batch merges on top of the empty commit
    EventStreams.mergeManifestBatch(
      Tables.events(spark, TestSpark.Sf), viewDir, buckets = 8, batchId = 1)
    assert(EventStreams.manifestView(spark, viewDir).count() > 0)
  }

  test("manifest view: crash between bucket write and commit never tears the view") {
    val dir = Files.createTempDirectory("graft-stream-manifest").toFile
    dir.deleteOnExit()
    val viewDir = dir.getAbsolutePath + "/view"
    val events  = Tables.events(spark, TestSpark.Sf)
    def snap(): Map[Long, (Long, java.math.BigDecimal)] =
      EventStreams.manifestView(spark, viewDir).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n_events"), r.getAs[java.math.BigDecimal]("total_value"))))
        .toMap

    EventStreams.mergeManifestBatch(events, viewDir, buckets = 16, batchId = 0)
    assert(EventStreams.readManifest(viewDir)._1 === 0)
    val view0 = snap()
    assert(view0.nonEmpty)

    // batch 1 crashes AFTER its multi-bucket data write, BEFORE commit —
    // the widest torn-view window the protocol has
    intercept[RuntimeException] {
      EventStreams.mergeManifestBatch(
        events, viewDir, 16, 1, () => throw new RuntimeException("injected crash"))
    }
    // the manifest still names batch 0's versions: readers see the OLD
    // view, complete and consistent — not a mix of old and new buckets
    assert(EventStreams.readManifest(viewDir)._1 === 0)
    assert(snap() === view0, "crash mid-commit must not change the visible view")

    // the replayed batch completes and merges EXACTLY once (the crashed
    // attempt's half-written v=1 dir is clobbered, not double-merged)
    EventStreams.mergeManifestBatch(events, viewDir, 16, 1)
    assert(EventStreams.readManifest(viewDir)._1 === 1)
    val view1 = snap()
    view0.foreach { case (u, (n0, _)) =>
      assert(view1(u)._1 === 2 * n0, s"user $u merged other than exactly twice")
    }

    // re-delivery of an already-committed batch is skipped outright
    EventStreams.mergeManifestBatch(events, viewDir, 16, 1)
    assert(snap() === view1)
  }

  test("manifest view: streaming convergence, O(touched) versioning") {
    val dir = Files.createTempDirectory("graft-stream-manifest2").toFile
    dir.deleteOnExit()
    val viewDir = dir.getAbsolutePath + "/view"
    val batch = Tables.events(spark, TestSpark.Sf)
    val oneUser = batch.select(col("user_id")).limit(1)
      .collect().head.getLong(0)
    batch.filter(col("user_id") =!= oneUser)
      .coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f1")
    batch.filter(col("user_id") === oneUser)
      .coalesce(1).write.parquet(dir.getAbsolutePath + "/src/f2")
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q = EventStreams
      .incrementalUserTotalsManifest(stream, viewDir, buckets = 16)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // converges to the batch aggregate through the manifest read path
    val view = EventStreams.manifestView(spark, viewDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toMap
    val expected = batch.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(view === expected)
    // O(touched): batch 1 carried ONE user, so exactly one bucket moved
    // to version 1 — every other bucket still reads from version 0
    val (committed, manifest) = EventStreams.readManifest(viewDir)
    assert(committed === 1)
    val hotBkt = spark.range(1)
      .select(pmod(hash(lit(oneUser)), lit(16))).collect().head.getInt(0)
    assert(manifest(hotBkt) === 1L)
    manifest.filter(_._1 != hotBkt).values.foreach(v => assert(v === 0L))
  }
}
