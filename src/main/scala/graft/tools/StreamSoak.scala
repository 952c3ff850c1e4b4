package graft.tools

import graft.GraftSession
import graft.streaming.EventStreams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import scala.collection.mutable.ArrayBuffer

/** Unbounded-source soak: drives the manifest-committed incremental view
  * and the native session-window aggregation from Spark's built-in
  * `rate` source for hundreds of micro-batches, and measures what the
  * file-replay specs cannot — sustained end-to-end behavior:
  *
  *   - per-batch processing latency (p50/p95/max triggerExecution)
  *   - exactly-once convergence of the manifest view against the
  *     cumulative committed input (checked, not assumed)
  *   - view-directory size/file-count stability (version pruning works
  *     under continuous load)
  *   - state-store row count and watermark lag stability for the
  *     session-window query (state is bounded by the watermark horizon,
  *     not by stream length)
  *
  * Env knobs: SOAK_BATCHES (default 250 per query), SOAK_ROWS_PER_SEC
  * (50000), SOAK_TRIGGER_MS (250), SOAK_USERS (50000), SOAK_BUCKETS (64).
  * Emits one JSON line per soak (consumed into BASELINE.md).
  */
object StreamSoak {
  final case class Rec(
      batchId: Long, rows: Long, ms: Long, stateRows: Long,
      outRows: Long, wmLagMs: Long)

  private def pct(xs: Seq[Long], p: Double): Long =
    if (xs.isEmpty) -1L
    else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))

  /** Collects one Rec per completed micro-batch of the given query. */
  private final class Collector(queryId: java.util.UUID) extends StreamingQueryListener {
    val recs = new ArrayBuffer[Rec]
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.id == queryId) {
        val stateRows =
          if (p.stateOperators == null) 0L
          else p.stateOperators.map(_.numRowsTotal).sum
        val wmLag = Option(p.eventTime.get("watermark")) match {
          case Some(w) if w.nonEmpty =>
            try System.currentTimeMillis() -
              java.time.Instant.parse(w).toEpochMilli
            catch { case _: Throwable => -1L }
          case _ => -1L
        }
        recs.synchronized {
          recs += Rec(
            p.batchId, p.numInputRows,
            Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L),
            stateRows, if (p.sink == null) 0L else p.sink.numOutputRows, wmLag)
        }
      }
    }
  }

  /** Runs until BOTH the batch count and the minimum wall time are
    * reached (or timeout). The wall-time floor matters when the soak's
    * asserts depend on event-time progress — the rate source's event
    * time tracks wall clock, so on hardware where batches keep up with
    * the trigger a pure batch-count budget can finish before any
    * watermark-gated output is even possible.
    */
  private def awaitBatches(
      spark: SparkSession, q: StreamingQuery, c: Collector, n: Int,
      timeoutMs: Long, minElapsedMs: Long = 0L): Unit = {
    val t0 = System.currentTimeMillis()
    def elapsed = System.currentTimeMillis() - t0
    while ((c.recs.synchronized(c.recs.size) < n || elapsed < minElapsedMs) &&
      elapsed < timeoutMs && q.isActive)
      Thread.sleep(200)
    q.stop()
    q.awaitTermination(60000)
    ()
  }

  /** The one rate-source reader both soaks drive (4 scan partitions). */
  private def rateSource(spark: SparkSession, rowsPerS: Int) =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerS.toString)
      .option("numPartitions", "4")
      .load()

  private def dirStats(dir: String): (Long, Long, Long) = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isFile) (1L, f.length)
      else Option(f.listFiles()).getOrElse(Array.empty)
        .map(walk).foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
    val root = new java.io.File(dir)
    val (files, bytes) = walk(root)
    val vDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("v="))
    (files, bytes, vDirs.toLong)
  }

  private def summarize(tag: String, recs: Seq[Rec], extra: String): String = {
    val ms = recs.map(_.ms).filter(_ >= 0)
    val s =
      s"""{"soak":"$tag","batches":${recs.size},"rows":${recs.map(_.rows).sum},""" +
        s""""lat_ms_p50":${pct(ms, 0.5)},"lat_ms_p95":${pct(ms, 0.95)},""" +
        s""""lat_ms_max":${if (ms.isEmpty) -1 else ms.max},$extra}"""
    println(s"### SOAK $s")
    s
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val batches   = sys.env.getOrElse("SOAK_BATCHES", "250").toInt
    val rowsPerS  = sys.env.getOrElse("SOAK_ROWS_PER_SEC", "50000").toInt
    val triggerMs = sys.env.getOrElse("SOAK_TRIGGER_MS", "250").toInt
    val users     = sys.env.getOrElse("SOAK_USERS", "50000").toLong
    val buckets   = sys.env.getOrElse("SOAK_BUCKETS", "64").toInt
    val stamp     = System.currentTimeMillis()
    val base      = s"/tmp/graft-soak-$stamp"
    val out       = new ArrayBuffer[String]

    // ---- soak 1: manifest-committed incremental view -------------------
    locally {
      val viewDir = s"$base/view"
      // ground truth per batch, counted HERE: the progress event's
      // numInputRows double-counts under foreachBatch (the merge runs
      // two actions over the micro-batch, and source metrics sum per
      // scan), so convergence is checked against our own counts.
      val batchRows = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val q = EventStreams.rateToEvents(rateSource(spark, rowsPerS), users)
        .writeStream
        .outputMode("update")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            val b = batch.localCheckpoint() // one source scan for all 3 actions
            batchRows.put(batchId, b.count())
            EventStreams.mergeManifestBatch(b.toDF(), viewDir, buckets, batchId)
        }
        .option("checkpointLocation", s"$base/cp-view")
        .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
        .start()
      val c = new Collector(q.id)
      spark.streams.addListener(c)
      awaitBatches(spark, q, c, batches, timeoutMs = 15 * 60 * 1000L)
      spark.streams.removeListener(c)
      val recs = c.recs.synchronized(c.recs.toVector).sortBy(_.batchId)
        .map(r => r.copy(rows = batchRows.getOrDefault(r.batchId, 0L).longValue))

      // exactly-once convergence: the view must hold precisely the rows
      // of every COMMITTED batch — no loss, no double-merge.
      val (committed, manifest) = EventStreams.readManifest(viewDir)
      val gapFree    = (0L to committed).forall(batchRows.containsKey)
      val expectRows = (0L to committed)
        .map(b => batchRows.getOrDefault(b, 0L).longValue).sum
      val got = EventStreams.manifestView(spark, viewDir)
        .agg(sum(col("n_events"))).head.getLong(0)
      val (files, bytes, vDirs) = dirStats(viewDir)
      val converged = gapFree && got == expectRows
      println(s"### SOAK view committed=$committed expect=$expectRows got=$got " +
        s"gapFree=$gapFree files=$files MiB=${bytes / (1 << 20)} vDirs=$vDirs " +
        s"buckets=${manifest.size}")
      out += summarize(
        "manifest_view", recs,
        s""""converged":$converged,"view_files":$files,""" +
          s""""view_mib":${bytes / (1 << 20)},"version_dirs":$vDirs,""" +
          s""""buckets":${manifest.size}""")
      require(converged, "manifest view failed exactly-once convergence")
    }

    // ---- soak 2: native session windows (watermarked state) ------------
    locally {
      // Bursty cohorts: with the plain rate mapping every user emits an
      // event every `users/rowsPerS` seconds, so no per-user gap ever
      // exceeds the 30 s session gap and `closed` stays 0 by construction.
      // Rotating the active third of the user base every `burstS` seconds
      // gives each cohort a 2*burstS idle window (> gap + watermark), so
      // its sessions genuinely close mid-stream — making both asserts
      // (closures happen, state plateaus) reachable and meaningful.
      val cohorts = 3
      val burstS  = 40L // idle 80 s > 30 s gap + 10 s watermark
      require(users >= cohorts, s"SOAK_USERS=$users must be >= $cohorts cohorts")
      // integer division: the active base is perCohort*cohorts users
      // (up to 2 fewer than SOAK_USERS), never a pmod-by-zero.
      val perCohort = users / cohorts
      val bursty = EventStreams.rateToEvents(rateSource(spark, rowsPerS), perCohort)
        .withColumn("user_id",
          col("user_id") + lit(perCohort) *
            pmod((col("ts") / lit(1000000L * burstS)).cast("long"), lit(cohorts.toLong)))
      val q = EventStreams
        .sessionWindows(bursty, gap = "30 seconds", watermark = "10 seconds")
        .writeStream
        .outputMode("append")
        .format("noop")
        .option("checkpointLocation", s"$base/cp-sessions")
        .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
        .start()
      val c = new Collector(q.id)
      spark.streams.addListener(c)
      // Wall-time floor: the first epoch-aligned rotation boundary can
      // land anywhere 0..burstS into the run, and a cohort's sessions
      // only emit once the watermark passes last-event + gap — so the
      // earliest possible closure is ~burstS + gap + watermark after
      // start. A pure batch-count budget finishes sooner on hardware
      // that keeps up with the trigger, leaving closed == 0 and failing
      // the require below spuriously.
      awaitBatches(spark, q, c, batches, timeoutMs = 15 * 60 * 1000L,
        minElapsedMs = (burstS + 30 + 10 + 15) * 1000L)
      spark.streams.removeListener(c)
      val recs = c.recs.synchronized(c.recs.toVector).sortBy(_.batchId)

      // state must plateau: compare mean state rows of the 3rd and 4th
      // quarters of the run — growth there means the watermark is not
      // evicting (unbounded state), the one failure mode a short replay
      // test can't see.
      val qn = recs.size / 4
      def mean(xs: Seq[Long]) = if (xs.isEmpty) 0.0 else xs.sum.toDouble / xs.size
      val q3 = mean(recs.slice(2 * qn, 3 * qn).map(_.stateRows))
      val q4 = mean(recs.slice(3 * qn, recs.size).map(_.stateRows))
      val wmLags = recs.map(_.wmLagMs).filter(_ >= 0)
      val closed = recs.map(_.outRows).sum
      println(f"### SOAK sessions stateQ3=$q3%.0f stateQ4=$q4%.0f " +
        s"closed=$closed wmLagP95=${pct(wmLags, 0.95)}ms")
      out += summarize(
        "session_windows", recs,
        f""""state_rows_q3":$q3%.0f,"state_rows_q4":$q4%.0f,""" +
          s""""sessions_closed":$closed,"wm_lag_ms_p95":${pct(wmLags, 0.95)},""" +
          s""""state_bounded":${q4 <= q3 * 1.5 + 1}""")
      require(closed > 0, "no sessions closed — watermark never advanced")
    }

    // ---- soak 3: funnel stage partials (the stream_funnel shape) -------
    // stream_funnel's production form: each micro-batch folds to per-user
    // stage-count partials appended exactly-once (idempotent per-batch
    // subdir, so a replayed batch overwrites instead of double-counting),
    // and the merged partials must converge to the per-stage totals of
    // every committed batch — checked against our own per-batch counts,
    // same rationale as soak 1. Also measures the state-compression
    // ratio (partial rows appended vs raw rows ingested): the reason the
    // finish pass reads state, never event history.
    locally {
      val partialsDir = s"$base/funnel-partials"
      // a 50×-smaller user base than the raw stream: each micro-batch
      // folds ~50 events per user into one partial row, so the
      // compression metric actually measures the state-vs-history gap
      // (with users >= rows/batch every user is distinct and the fold
      // is a no-op by construction)
      val funnelUsers = math.max(users / 50, 1L)
      val batchCounts =
        new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, Long, Long)]()
      val q = EventStreams.rateToEvents(rateSource(spark, rowsPerS), funnelUsers)
        .writeStream
        .outputMode("update")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            val b = batch.localCheckpoint()
            val byType = b.groupBy(col("event_type")).count()
              .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
            batchCounts.put(batchId, (
              byType.getOrElse("view", 0L), byType.getOrElse("click", 0L),
              byType.getOrElse("purchase", 0L), b.count()))
            graft.operators.Extended.perUserStages(b.toDF())
              .write.mode("overwrite").parquet(s"$partialsDir/b=$batchId")
        }
        .option("checkpointLocation", s"$base/cp-funnel")
        .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
        .start()
      val c = new Collector(q.id)
      spark.streams.addListener(c)
      awaitBatches(spark, q, c, batches, timeoutMs = 15 * 60 * 1000L)
      spark.streams.removeListener(c)
      val recs = c.recs.synchronized(c.recs.toVector).sortBy(_.batchId)
        .map(r => r.copy(rows = Option(batchCounts.get(r.batchId)).map(_._4).getOrElse(0L)))

      import scala.jdk.CollectionConverters._
      val committed = batchCounts.keys.asScala.toVector.sorted
      val expect = committed.map(batchCounts.get)
        .foldLeft((0L, 0L, 0L)) { case ((v, cl, p), (bv, bc, bp, _)) =>
          (v + bv, cl + bc, p + bp)
        }
      val merged = spark.read.parquet(
        committed.map(b => s"$partialsDir/b=$b"): _*)
      val got = merged.agg(
        sum(col("views")), sum(col("clicks")), sum(col("purchases"))).head
      val gotT = (got.getLong(0), got.getLong(1), got.getLong(2))
      val partialRows = merged.count()
      val rawRows = committed.map(b => batchCounts.get(b)._4).sum
      val converged = gotT == expect
      println(s"### SOAK funnel committed=${committed.size} expect=$expect got=$gotT " +
        s"partialRows=$partialRows rawRows=$rawRows")
      out += summarize(
        "funnel_partials", recs,
        s""""converged":$converged,"partial_rows":$partialRows,""" +
          s""""raw_rows":$rawRows,"compression":${
            if (rawRows == 0) 0.0
            else math.round(partialRows.toDouble / rawRows * 1000) / 1000.0}""")
      require(converged, "funnel partials failed exactly-once convergence")
    }

    // ---- soak 4: stateless quality gate (stream_quality_gate shape) -----
    // Thresholds trained ONCE on a synthetic base corpus, broadcast into
    // every micro-batch; the soak checks the stateless invariants the
    // file-replay oracle can't: latency stays flat with no state growth,
    // and kept + dropped converges exactly-once to the committed input.
    locally {
      val gateDir = s"$base/gate"
      def docsOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.select(
          col("value").as("doc_id"),
          concat(lit("l"), pmod(col("value"), lit(5L))).as("lang"),
          // repetition varies by value so the distinct-token ratio has a
          // real per-lang distribution for the z-gate to cut
          expr("""concat_ws(' ', transform(sequence(0, CAST(pmod(value, 24) + 4 AS INT)),
                 |  i -> concat('w', pmod(value * 7 + i * i, pmod(value, 13) + 3))))""".stripMargin)
            .as("text"))
      val score = expr(
        "size(array_distinct(split(text, ' '))) / CAST(size(split(text, ' ')) AS DOUBLE)")
      val nD   = col("n").cast("double")
      val mean = col("s1") / nD
      val sd = sqrt(greatest(
        (col("s2") - col("s1") * col("s1") / nD) / (nD - 1.0), lit(0.0)))
      val thr = docsOf(spark.range(100000).select(col("id").as("value")))
        .select(col("lang"), score.as("score"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          graft.Det.fineSum(col("score")).as("s1"),
          graft.Det.fineSum(col("score") * col("score")).as("s2"))
        .select(col("lang"), (mean - sd).as("threshold"))
        .localCheckpoint()
      val batchCounts =
        new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
      val q = rateSource(spark, rowsPerS)
        .writeStream
        .outputMode("append")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            val verdicts = docsOf(batch.toDF())
              .select(col("doc_id"), col("lang"), score.as("score"))
              .join(broadcast(thr), Seq("lang"), "left")
              .select(
                col("doc_id"),
                when(col("score") < col("threshold"), lit(false))
                  .otherwise(lit(true)).as("keep"))
              .localCheckpoint()
            val kept = verdicts.filter(col("keep")).count()
            val total = verdicts.count()
            batchCounts.put(batchId, (kept, total))
            verdicts.write.mode("overwrite").parquet(s"$gateDir/b=$batchId")
        }
        .option("checkpointLocation", s"$base/cp-gate")
        .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
        .start()
      val c = new Collector(q.id)
      spark.streams.addListener(c)
      awaitBatches(spark, q, c, batches, timeoutMs = 15 * 60 * 1000L)
      spark.streams.removeListener(c)
      val recs = c.recs.synchronized(c.recs.toVector).sortBy(_.batchId)
        .map(r => r.copy(rows = Option(batchCounts.get(r.batchId)).map(_._2).getOrElse(0L)))

      import scala.jdk.CollectionConverters._
      val committed = batchCounts.keys.asScala.toVector.sorted
      val expectRows = committed.map(b => batchCounts.get(b)._2).sum
      val expectKept = committed.map(b => batchCounts.get(b)._1).sum
      val written = spark.read.parquet(committed.map(b => s"$gateDir/b=$b"): _*)
      val gotRows = written.count()
      val gotKept = written.filter(col("keep")).count()
      val maxState = recs.map(_.stateRows).max
      val converged = gotRows == expectRows && gotKept == expectKept
      println(s"### SOAK gate committed=${committed.size} expectRows=$expectRows " +
        s"gotRows=$gotRows kept=$gotKept/$expectKept stateRowsMax=$maxState")
      out += summarize(
        "quality_gate", recs,
        s""""converged":$converged,"kept":$gotKept,"dropped":${gotRows - gotKept},""" +
          s""""state_rows_max":$maxState""")
      require(converged, "quality gate failed exactly-once convergence")
      require(maxState == 0L, "stateless gate grew state")
    }

    // ---- soak 5: mix-plan ingest (stream_mix_ingest shape) --------------
    // The epoch plan is trained ONCE on a synthetic base corpus (same
    // Curation.MaxEpochs/BudgetMultiple constants as the production
    // query), broadcast into every micro-batch, and each arriving doc
    // gets its integer repeat count from the deterministic md5 line.
    // The soak checks what the file-replay oracle can't: sustained
    // latency with zero state, exactly-once sink convergence, AND the
    // batch-equivalence property the query's docstring promises — a
    // one-shot batch recompute over every written doc_id must agree
    // with the streamed verdicts row-for-row (per-row independence of
    // the micro-batch partitioning).
    locally {
      val mixDir = s"$base/mix"
      def docsOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.select(
          col("value").as("doc_id"),
          concat(lit("s"), pmod(col("value"), lit(6L))).as("source"),
          // token counts vary by source so per-source availability is
          // skewed and the epoch cap genuinely binds for small sources
          (pmod(col("value") * 31L, lit(40L)) + lit(5L) +
            pmod(col("value"), lit(6L)) * lit(25L)).as("nt"))
      val plan = {
        val per = docsOf(spark.range(100000).select(col("id").as("value")))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("avail_tokens"))
          .withColumn("sq", sqrt(col("n_docs").cast("double")))
        val denom = per.agg(
          graft.Det.fineSum(col("sq")).as("sq_sum"),
          sum(col("avail_tokens")).as("total_tokens"))
        per.crossJoin(broadcast(denom))
          .select(
            col("source").as("psrc"),
            least(
              lit(graft.operators.Curation.MaxEpochs),
              (col("sq") / col("sq_sum")) *
                (lit(graft.operators.Curation.BudgetMultiple) *
                  col("total_tokens").cast("double"))
                / col("avail_tokens").cast("double")).as("epochs"))
          .localCheckpoint()
      }
      def verdictsOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        docs
          .join(broadcast(plan), col("source") === col("psrc"), "left")
          .withColumn(
            "u",
            expr("CAST(conv(substr(md5(concat('mix:', CAST(doc_id AS STRING))), 1, 13), 16, 10) AS BIGINT)")
              .cast("double") / lit(4503599627370496.0))
          .select(
            col("doc_id"),
            col("source"),
            when(col("epochs").isNull, lit(0L))
              .otherwise(
                floor(col("epochs")) +
                  when(col("u") < col("epochs") - floor(col("epochs")).cast("double"), 1L)
                    .otherwise(0L))
              .as("repeats"))
      val batchCounts =
        new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long)]()
      val q = rateSource(spark, rowsPerS)
        .writeStream
        .outputMode("append")
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            val v = verdictsOf(docsOf(batch.toDF())).localCheckpoint()
            val sums = v.agg(count(lit(1)), sum(col("repeats"))).head
            batchCounts.put(batchId,
              (sums.getLong(0), if (sums.isNullAt(1)) 0L else sums.getLong(1)))
            v.write.mode("overwrite").parquet(s"$mixDir/b=$batchId")
        }
        .option("checkpointLocation", s"$base/cp-mix")
        .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
        .start()
      val c = new Collector(q.id)
      spark.streams.addListener(c)
      awaitBatches(spark, q, c, batches, timeoutMs = 15 * 60 * 1000L)
      spark.streams.removeListener(c)
      val recs = c.recs.synchronized(c.recs.toVector).sortBy(_.batchId)
        .map(r => r.copy(rows = Option(batchCounts.get(r.batchId)).map(_._1).getOrElse(0L)))

      import scala.jdk.CollectionConverters._
      val committed = batchCounts.keys.asScala.toVector.sorted
      val expectRows    = committed.map(b => batchCounts.get(b)._1).sum
      val expectRepeats = committed.map(b => batchCounts.get(b)._2).sum
      val written = spark.read.parquet(committed.map(b => s"$mixDir/b=$b"): _*)
      val gotRow = written.agg(count(lit(1)), sum(col("repeats"))).head
      val gotRows    = gotRow.getLong(0)
      val gotRepeats = if (gotRow.isNullAt(1)) 0L else gotRow.getLong(1)
      // batch equivalence: recompute every verdict in ONE batch pass and
      // diff against the streamed rows — zero mismatches proves the
      // repeat rule is independent of micro-batch partitioning
      val replay = verdictsOf(
        docsOf(written.select(col("doc_id").as("value"))))
        .withColumnRenamed("repeats", "replay_repeats")
        .select(col("doc_id"), col("replay_repeats"))
      val mismatches = written
        .join(replay, Seq("doc_id"))
        .filter(col("repeats") =!= col("replay_repeats"))
        .count()
      val maxState = recs.map(_.stateRows).max
      val converged =
        gotRows == expectRows && gotRepeats == expectRepeats && mismatches == 0L
      println(s"### SOAK mix committed=${committed.size} expectRows=$expectRows " +
        s"gotRows=$gotRows repeats=$gotRepeats/$expectRepeats " +
        s"replayMismatches=$mismatches stateRowsMax=$maxState")
      out += summarize(
        "mix_ingest", recs,
        s""""converged":$converged,"repeats_written":$gotRepeats,""" +
          s""""replay_mismatches":$mismatches,"state_rows_max":$maxState""")
      require(converged, "mix ingest failed exactly-once/batch-equivalence")
      require(maxState == 0L, "stateless mix ingest grew state")
    }

    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SOAK_OUT", "bench/SOAK_last.json")),
      (out.mkString("\n") + "\n").getBytes)
    spark.stop()
  }
}
