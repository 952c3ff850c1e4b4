package graft.streaming

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming document pipeline: the ingest-side twin of the batch dedup
  * tier. A 100 TB crawl doesn't arrive as a table — it arrives as a
  * stream, and near-dup filtering belongs at ingest so duplicates never
  * reach storage.
  */
object DocStreams {

  /** One flagged duplicate: doc was matched against an earlier doc in
    * one of its LSH band buckets. A doc landing in several buckets can
    * emit one hit per bucket — consumers dedup by doc_id downstream
    * (the spec does; a bounded per-doc-id aggregate in production).
    */
  final case class DupHit(doc_id: Long, dup_of: Long, est_jaccard: Double)

  /** Streaming MinHash+LSH near-dup filter. Incoming docs are
    * signature'd in-row (the same codegen'd `graft_minhash_md5` kernel
    * and 16×4 banding as batch dedup_minhash), grouped by band bucket,
    * and compared against PER-BUCKET STATE of previously seen
    * signatures via flatMapGroupsWithState — first-seen wins as the
    * original, later arrivals with est-Jaccard ≥ `tau` are emitted as
    * [[DupHit]]s.
    *
    * Scale bounds, by construction: state per bucket is capped at
    * `bucketCap` signatures (k longs each) — hot buckets stop absorbing
    * new originals instead of growing without bound, trading recall
    * inside a pathological bucket for bounded memory, exactly like the
    * batch path's bucket-size cap; per-row work is O(bands · cap · k).
    * In-batch ordering is made deterministic by processing each
    * micro-batch's bucket group in doc_id order.
    */
  def nearDupFilter(
      docs: DataFrame,
      k: Int = 64,
      tau: Double = 0.5,
      bucketCap: Int = 32): Dataset[DupHit] = {
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    import spark.implicits._

    val banded = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), expr(s"graft_minhash_md5(t, $k)").as("sig"))
      .select(
        col("doc_id"),
        col("sig"),
        explode(expr(
          """transform(sequence(0, 15), b -> concat(CAST(b AS STRING), '|',
            |  array_join(transform(slice(sig, b * 4 + 1, 4), x -> CAST(x AS STRING)), ',')))""".stripMargin))
          .as("bucket"))
      .as[(Long, Seq[Long], String)]

    def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
      var same = 0
      var i = 0
      while (i < k) { if (a(i) == b(i)) same += 1; i += 1 }
      same.toDouble / k
    }

    banded
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, Seq[Long], String)],
         state: GroupState[(Seq[Long], Seq[Seq[Long]])]) => {
          val st = state.getOption.getOrElse((Seq.empty[Long], Seq.empty[Seq[Long]]))
          var ids  = st._1
          var sigs = st._2
          val out  = List.newBuilder[DupHit]
          rows.toSeq.sortBy(_._1).foreach { case (id, sig, _) =>
            var bestId  = -1L
            var bestEst = -1.0
            ids.iterator.zip(sigs.iterator).foreach { case (oid, osig) =>
              val e = estJaccard(sig, osig)
              if (e > bestEst || (e == bestEst && oid < bestId)) {
                bestEst = e; bestId = oid
              }
            }
            if (bestEst >= tau) out += DupHit(id, bestId, bestEst)
            else if (ids.length < bucketCap) { ids :+= id; sigs :+= sig }
          }
          state.update((ids, sigs))
          out.result().iterator
        })
  }

  /** Batch-checkable registration of the streaming ingest path: the
    * delta corpus (doc_id % 10 >= 8 — the same split dedup_incremental
    * uses) is re-published as a 4-file parquet stream and consumed with
    * Trigger.AvailableNow + maxFilesPerTrigger=2 — two micro-batches,
    * so the run exercises REAL micro-batch plumbing (multiple
    * foreachBatch calls with checkpointed progress), not one degenerate
    * batch, while keeping the per-batch plan-execution floor (~1 s at
    * sf0.1, size-independent) from dominating the bench number. Each
    * micro-batch probes the SAME stored base index as the batch query
    * (Dedup.incrementalProbe) and appends its verdicts. Because the
    * verdicts are per-delta-row independent, the union over any batch
    * partitioning is byte-identical to dedup_incremental's output, so
    * this query shares its DuckDB oracle — the streaming surface a
    * 100 TB crawl ingest runs: state lives in the stored index,
    * per-batch cost ∝ batch size.
    */
  def streamDedupIngest(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val idx = graft.operators.Dedup.incrementalIndexDir(spark, dir)
    val delta = Tables
      .documents(spark, dir)
      .filter((col("doc_id") % 10) >= 8)
      .select(col("doc_id"), col("text"))
    // the published 4-file stream source is deterministic per corpus —
    // build it once via DerivedCache (a production ingest's source
    // already exists; re-publishing per run is scaffolding cost)
    val rows = Tables.cachedCount(spark, dir, "documents")
    val srcDir = graft.sources.DerivedCache.dir(
      dir, "stream-dedup-src", s"rows=$rows;files=4") { out =>
      delta.repartition(4, col("doc_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/files")
      ()
    } + "/files"
    StreamRunner.runAvailableNow(
      spark,
      schema = delta.schema,
      srcDir = srcDir,
      maxFilesPerTrigger = 2,
      tmpPrefix = "graft-stream-dedup",
      mkHandler = outDir =>
        (batch, _) => {
          val (verdicts, sigs) = graft.operators.Dedup
            .incrementalProbe(spark, idx, batch.toDF(), deltaIsSmall = true)
          verdicts.write.mode("append").parquet(outDir)
          // no-op today (small-batch probes skip the persist), kept so a
          // future persistSigs change can't leak per-batch cached frames
          sigs.unpersist(blocking = false)
          ()
        },
      finish = _.orderBy(col("doc_id")),
      // zero-row delta: the stream ran no data batches — degrade to an
      // empty frame with the verdict schema (EmptyInputSpec contract)
      empty = {
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          StructType(Seq(
            StructField("doc_id", LongType),
            StructField("n_dups", LongType, nullable = false),
            StructField("dup_of", LongType),
            StructField("est", DoubleType),
            StructField("keep", BooleanType, nullable = false))))
      })
  }

  /** Streaming leg of the substring-index LSM ingest — the append
    * probe (dedup_substring_index_append) driven from micro-batches:
    * today's batch (`doc_id % 10 == 9`) re-published as a 4-file
    * parquet stream, consumed with Trigger.AvailableNow +
    * maxFilesPerTrigger=2 (two REAL micro-batches with checkpointed
    * progress), each batch window-hashed fresh and probed against the
    * SAME stored base + batch-1 segment tables the batch query reads.
    * Verdicts are per-delta-row independent (the append kernel's
    * contract), so the union over any batch partitioning is
    * byte-identical to dedup_substring_index_append's output and the
    * query shares its DuckDB oracle — closing the LSM loop: the tier
    * exists FOR ingest, and this is the ingest runner actually driving
    * it. Per-batch cost ∝ batch size (bounded-batch broadcast probe,
    * zero exchange anywhere); segment maintenance stays with the batch
    * compaction queries.
    */
  def streamSubstrIngest(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // force the stored base+seg builds BEFORE the stream starts: index
    // maintenance is a batch job; the stream only probes
    val segs = graft.operators.Cdc.substrAppendSegs(spark, dir)
    val delta = Tables
      .documents(spark, dir)
      .filter((col("doc_id") % 10) === 9)
      .select(col("doc_id"), col("text"))
    val rows = Tables.cachedCount(spark, dir, "documents")
    val srcDir = graft.sources.DerivedCache.dir(
      dir, "stream-substr-src", s"rows=$rows;files=4") { out =>
      delta.repartition(4, col("doc_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/files")
      ()
    } + "/files"
    StreamRunner.runAvailableNow(
      spark,
      schema = delta.schema,
      srcDir = srcDir,
      maxFilesPerTrigger = 2,
      tmpPrefix = "graft-stream-substr",
      mkHandler = outDir =>
        (batch, _) => {
          graft.operators.Cdc
            .dedupSubstringIndexAppendUnorderedOf(
              batch.toDF(), segs, deltaIsSmall = true)
            .write.mode("append").parquet(outDir)
          ()
        },
      finish = _.orderBy(col("doc_id")),
      empty = {
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          StructType(Seq(
            StructField("doc_id", LongType),
            StructField("n_windows", LongType, nullable = false),
            StructField("n_dups", LongType, nullable = false),
            StructField("dup_of", LongType),
            StructField("dup_tier", StringType),
            StructField("n_shared", LongType),
            StructField("est_overlap_tokens", LongType),
            StructField("keep", BooleanType, nullable = false))))
      })
  }

  /** Streaming quality gate — the lambda-architecture twin of
    * quality_adaptive_gate: per-language z-score drop lines are TRAINED
    * once on the base corpus slice (doc_id % 10 < 8, the
    * dedup_incremental split) and stored build-once; the delta stream
    * then applies them per micro-batch with one broadcast join — the
    * shape a 100 TB ingest runs, where thresholds come from yesterday's
    * batch job and the stream only scores + gates. A language the base
    * never saw has no threshold and is KEPT (absence of evidence is not
    * a drop line). Verdicts are per-row independent, so the union over
    * any micro-batch partitioning is byte-identical to the batch
    * equivalent — the query shares a plain batch oracle (the
    * stream_dedup_ingest contract). Same micro-batch plumbing: 4-file
    * published source, Trigger.AvailableNow, maxFilesPerTrigger=2,
    * checkpointed idempotent appends.
    */
  def streamQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val docs  = Tables.documents(spark, dir)
    val rows  = Tables.cachedCount(spark, dir, "documents")
    val score = expr(
      "size(array_distinct(split(text, ' '))) / CAST(size(split(text, ' ')) AS DOUBLE)")
    // stored per-lang thresholds: exact DECIMAL power sums, the
    // quality_adaptive_gate recipe (builtin stddev is partition-order-
    // dependent and can never hash-match), NULL below n=2
    val thrDir = graft.sources.DerivedCache.dir(
      dir, "quality-thresholds", s"rows=$rows;v=1") { out =>
      val nD = col("n").cast("double")
      val mean = col("s1") / nD
      val sd = sqrt(greatest(
        (col("s2") - col("s1") * col("s1") / nD) / (nD - 1.0), lit(0.0)))
      docs
        .filter(col("doc_id") % 10 < 8)
        .select(col("lang"), score.as("score"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          graft.Det.fineSum(col("score")).as("s1"),
          graft.Det.fineSum(col("score") * col("score")).as("s2"))
        .select(
          col("lang"),
          when(col("n") < 2, lit(null).cast("double"))
            .otherwise(mean - sd).as("threshold"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$out/thr")
      ()
    }
    val thr = spark.read.parquet(s"$thrDir/thr")
    val delta = docs
      .filter((col("doc_id") % 10) >= 8)
      .select(col("doc_id"), col("lang"), col("text"))
    val srcDir = graft.sources.DerivedCache.dir(
      dir, "stream-quality-src", s"rows=$rows;files=4") { out =>
      delta.repartition(4, col("doc_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/files")
      ()
    } + "/files"
    StreamRunner.runAvailableNow(
      spark,
      schema = delta.schema,
      srcDir = srcDir,
      maxFilesPerTrigger = 2,
      tmpPrefix = "graft-stream-quality",
      mkHandler = outDir =>
        (batch, _) => {
          batch.toDF()
            .select(col("doc_id"), col("lang"), score.as("score"))
            .join(broadcast(thr), Seq("lang"), "left")
            .select(
              col("doc_id"),
              col("lang"),
              graft.Det.detRound(col("score"), 6).as("score"),
              graft.Det.detRound(col("threshold"), 6).as("threshold"),
              when(col("score") < col("threshold"), lit(false))
                .otherwise(lit(true)).as("keep"))
            .write.mode("append").parquet(outDir)
          ()
        },
      finish = _.orderBy(col("doc_id")),
      empty = {
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("doc_id", LongType),
            StructField("lang", StringType),
            StructField("score", DoubleType),
            StructField("threshold", DoubleType),
            StructField("keep", BooleanType, nullable = false))))
      })
  }

  /** Batch oracle of streamQualityGate: thresholds from the base slice,
    * verdicts over the delta slice, replayed with the same NULL-keep
    * and n≥2 rules.
    */
  private val streamQualityGateSql = {
    def r6(e: String) = graft.Det.roundSql(e, 6)
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |         len(list_distinct(string_split(text, ' ')))
       |           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
       |  FROM documents
       |), st AS (
       |  SELECT lang, count(*) AS n,
       |         CAST(SUM(CAST(score AS DECIMAL(30,10))) AS DOUBLE) AS s1,
       |         CAST(SUM(CAST(score * score AS DECIMAL(30,10))) AS DOUBLE) AS s2
       |  FROM scored WHERE doc_id % 10 < 8 GROUP BY lang
       |), thr AS (
       |  SELECT lang,
       |         CASE WHEN n < 2 THEN NULL
       |              ELSE s1 / n - sqrt(greatest(
       |                     (s2 - s1 * s1 / n) / (n - 1), 0.0)) END AS threshold
       |  FROM st
       |)
       |SELECT d.doc_id, d.lang,
       |       ${r6("d.score")} AS score,
       |       ${r6("t.threshold")} AS threshold,
       |       CASE WHEN d.score < t.threshold THEN FALSE ELSE TRUE END AS keep
       |FROM scored d LEFT JOIN thr t USING (lang)
       |WHERE d.doc_id % 10 >= 8
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The mixing plan SERVED AT INGEST — token_mix_sample's streaming
    * twin and the loader-side shape a 100 TB pipeline actually runs:
    * the per-source epoch schedule is trained ONCE on the BASE corpus
    * slice (doc_id % 10 < 8 — the corpus that existed at plan time)
    * and persisted via DerivedCache; each arriving delta micro-batch
    * joins the tiny broadcast plan and decides every doc's repeat
    * factor alone (floor(epochs) + the exact-dyadic salted-hash coin —
    * same 'mix:' salt as the batch sampler, so a doc draws the same
    * up-sample verdict in either materialization). A source unseen at
    * plan time gets repeats = 0 and planned = false — the honest
    * "unplanned source arrived" signal. Per-row independence makes the
    * union over any micro-batch partitioning byte-identical to the
    * batch replay, which is what lets one DuckDB oracle check the
    * whole streaming run.
    */
  def streamMixIngest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rows = Tables.cachedCount(spark, dir, "documents")
    val planDir = graft.sources.DerivedCache.dir(
      dir, "mix-plan-base",
      s"rows=$rows;budget=${graft.operators.Curation.BudgetMultiple};" +
        s"cap=${graft.operators.Curation.MaxEpochs};v=1") { out =>
      val base = docs
        .filter(col("doc_id") % 10 < 8)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      val per = base
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("avail_tokens"))
        .withColumn("sq", sqrt(col("n_docs").cast("double")))
      val denom = per.agg(
        sum(col("sq").cast(graft.Det.Fine)).cast("double").as("sq_sum"),
        sum(col("avail_tokens")).as("total_tokens"))
      per
        .crossJoin(broadcast(denom))
        .select(
          col("source").as("psrc"),
          least(
            lit(graft.operators.Curation.MaxEpochs),
            (col("sq") / col("sq_sum")) *
              (lit(graft.operators.Curation.BudgetMultiple) * col("total_tokens").cast("double"))
              / col("avail_tokens").cast("double")).as("epochs"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$out/plan")
      ()
    }
    val plan = spark.read.parquet(s"$planDir/plan")
    val delta = docs
      .filter((col("doc_id") % 10) >= 8)
      .select(col("doc_id"), col("source"), col("text"))
    val srcDir = graft.sources.DerivedCache.dir(
      dir, "stream-mix-src", s"rows=$rows;files=4") { out =>
      delta.repartition(4, col("doc_id"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/files")
      ()
    } + "/files"
    StreamRunner.runAvailableNow(
      spark,
      schema = delta.schema,
      srcDir = srcDir,
      maxFilesPerTrigger = 2,
      tmpPrefix = "graft-stream-mix",
      mkHandler = outDir =>
        (batch, _) => {
          batch.toDF()
            .select(
              col("doc_id"), col("source"),
              size(split(col("text"), " ")).cast("long").as("nt"))
            .join(broadcast(plan), col("source") <=> col("psrc"), "left")
            .withColumn(
              "u",
              expr("CAST(conv(substr(md5(concat('mix:', CAST(doc_id AS STRING))), 1, 13), 16, 10) AS BIGINT)")
                .cast("double") / lit(4503599627370496.0))
            .select(
              col("doc_id"),
              col("source"),
              col("nt"),
              when(col("epochs").isNull, lit(0L))
                .otherwise(
                  floor(col("epochs")) +
                    when(col("u") < col("epochs") - floor(col("epochs")).cast("double"), 1L)
                      .otherwise(0L))
                .as("repeats"),
              col("epochs").isNotNull.as("planned"))
            .write.mode("append").parquet(outDir)
          ()
        },
      finish = _.orderBy(col("doc_id")),
      empty = {
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("doc_id", LongType),
            StructField("source", StringType),
            StructField("nt", LongType),
            StructField("repeats", LongType),
            StructField("planned", BooleanType, nullable = false))))
      })
  }

  /** Batch oracle of streamMixIngest: the base-slice plan and the
    * per-delta-doc repeat rule replayed in SQL.
    */
  private val streamMixIngestSql = {
    s"""WITH docs AS (
       |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
       |  FROM documents
       |), per AS (
       |  SELECT source, count(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS avail_tokens
       |  FROM docs WHERE doc_id % 10 < 8 GROUP BY source
       |), sq AS (
       |  SELECT source, n_docs, avail_tokens, sqrt(CAST(n_docs AS DOUBLE)) AS sq FROM per
       |), denom AS (
       |  SELECT CAST(SUM(CAST(sq AS DECIMAL(30,10))) AS DOUBLE) AS sq_sum,
       |         CAST(SUM(avail_tokens) AS BIGINT) AS total_tokens
       |  FROM sq
       |), plan AS (
       |  SELECT source AS psrc,
       |         least(${graft.operators.Curation.MaxEpochs},
       |               (sq / sq_sum) * (${graft.operators.Curation.BudgetMultiple} * CAST(total_tokens AS DOUBLE))
       |                 / CAST(avail_tokens AS DOUBLE)) AS epochs
       |  FROM sq, denom
       |), delta AS (
       |  SELECT d.doc_id, d.source, d.nt, p.epochs,
       |         CAST(('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE)
       |           / 4503599627370496.0 AS u
       |  FROM docs d LEFT JOIN plan p ON d.source IS NOT DISTINCT FROM p.psrc
       |  WHERE d.doc_id % 10 >= 8
       |)
       |SELECT doc_id, source, nt,
       |       CASE WHEN epochs IS NULL THEN 0
       |            ELSE CAST(floor(epochs) AS BIGINT) +
       |                 CASE WHEN u < epochs - floor(epochs) THEN 1 ELSE 0 END
       |       END AS repeats,
       |       epochs IS NOT NULL AS planned
       |FROM delta
       |ORDER BY doc_id""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "stream_mix_ingest" -> QueryDef(streamMixIngest, Some(streamMixIngestSql)),
    "stream_dedup_ingest" -> QueryDef(
      streamDedupIngest, Some(graft.operators.Dedup.dedupIncrementalSql)),
    "stream_substr_ingest" -> QueryDef(
      streamSubstrIngest,
      Some(graft.operators.Cdc.dedupSubstringIndexAppendSql)),
    "stream_quality_gate" -> QueryDef(
      streamQualityGate, Some(streamQualityGateSql)))
}
