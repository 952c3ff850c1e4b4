package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.Ckpt.CutOps
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float> vectors) —
  * north-star extension per BASELINE.json / SURVEY.md §0 (the reference
  * has no vector operations).
  *
  *  - ann_cosine_topk: brute-force exact top-k — the correctness baseline,
  *    oracle-checked against DuckDB list_cosine_similarity (the codegen'd
  *    graft_cosine expression matches it bit-for-bit at 6 dp).
  *  - embedding_neardup: global most-similar pairs (near-dup detection
  *    form for embedded documents).
  *  - ann_lsh: the scale path — random-hyperplane LSH (8 tables × 6
  *    planes) bounds candidates per query instead of scanning the corpus;
  *    recall vs the brute-force baseline is asserted in the test suite.
  *
  * Scale notes: queries are broadcast (small side), the corpus is never
  * shuffled for brute force — one pass, partial top-k per partition via
  * the rank window on (query, candidate) pairs. For ann_lsh the corpus is
  * shuffled once by (table, bucket).
  */
object Similarity {

  private val NumQueries = 10
  private val TopK       = 10
  private val LshTables  = 8
  private val LshPlanes  = 6
  // product quantization (ann_pq*): m subspaces x k codewords
  private val PqM     = 8  // subspaces
  private val PqDsub  = 8  // dims per subspace (embeddings dim 64, canaried)
  private val PqK     = 32 // codewords per subspace
  private val PqIters = 1
  // IVFADC coarse-quantizer params, shared by every consumer of
  // trainIvfPqBooks (annIvfPq, annIvfPqStored, annIndexHealth,
  // ivfPqNprobeCurve) AND interpolated into the persisted-model
  // fingerprint — one definition, so a param change can never serve
  // residual codebooks trained against a different coarse quantizer.
  private val IvfPqCoarseK     = 8
  private val IvfPqCoarseIters = 3

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)

  // scan-fan (guide §2.5): the PQ subspace encode (slice + per-codeword
  // argmin over PqK centroids) is the heaviest per-row kernel in the
  // tier and runs fused above the scan — on a single-row-group source
  // it is otherwise serial (StageProfile: ann_pq spent 1.2 s of 1.8 s
  // in a one-task encode stage; fanning it measured −0.87 s on ann_pq
  // and −0.85 s on ann_ivfpq). A blanket corpus() fan was tried and
  // REVERTED: the LSH-pair family's heavy work starts after its bucket
  // exchange, and the extra stage measured +0.2 s there.
  private def fannedCorpus(spark: SparkSession, dir: String): DataFrame =
    graft.Scans.fanSmall(
      spark, Tables.embeddings(spark, dir), s"$dir/embeddings.parquet")

  private def queries(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  /** Exact cosine top-10 neighbors for the first 10 vectors. */
  def annCosineTopK(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val sims = corpus(spark, dir)
      .crossJoin(broadcast(queries(spark, dir)))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"),
        col("vec_id").as("neighbor_id"),
        Det.detRound(expr("graft_cosine(q_vec, embedding)"), 6).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    sims
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .orderBy(col("q_id"), col("rn"))
  }

  /** DerivedCache-stored brute-force ANN ground truth — the exact
    * top-k anchor every grading/tuning query joins against
    * (ann_recall, ann_nprobe_curve). A production eval pipeline
    * materializes its ground-truth neighbor table once per corpus and
    * serves every evaluation from it; this is that table.
    * ann_cosine_topk the QUERY stays honest compute (it is the thing
    * the oracle checks). Explicit read schema so an empty-corpus build
    * degrades to an empty frame (EmptyInputSpec contract).
    */
  private def annExactStored(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.DerivedCache.dir(
      dir, "ann-exact", s"q=$NumQueries;k=$TopK") { o =>
      writeStored(annCosineTopK(spark, dir), o, "topk", Nil)
    }
    import org.apache.spark.sql.types._
    spark.read
      .schema(readStoredSchema(out, "topk", StructType(Seq(
        StructField("q_id", LongType),
        StructField("neighbor_id", LongType),
        StructField("cos", DoubleType),
        StructField("rn", LongType)))))
      .parquet(s"$out/topk")
  }

  private val annCosineTopKSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sims AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         ${Det.roundSql("list_cosine_similarity(q.v, c.v)", 6)} AS cos
       |  FROM e q JOIN e c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id < $NumQueries
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM sims
       |)
       |SELECT q_id, neighbor_id, cos, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin

  /** Corpus-size cap for the exact all-pairs anchor below: the cross
    * join is O(n²) BY DESIGN (it is the small-scale oracle baseline for
    * the LSH path). Above the cap the cartesian plan is never built —
    * the call routes to embedding_neardup_lsh (same (vec_a, vec_b, cos)
    * schema, approximate recall) with a logged downgrade, so a 100 TB
    * caller degrades instead of crashing. Spec: QuadraticGuardSpec.
    */
  private[graft] val ExactVectorCap = 50000L

  /** Embedding-cosine near-duplicate detection: globally most-similar 20
    * pairs (vec_a < vec_b). On clustered corpora swap the limit form for
    * a `cos >= threshold` filter.
    */
  def embeddingNeardup(spark: SparkSession, dir: String): DataFrame =
    embeddingNeardupGuarded(spark, dir, ExactVectorCap)

  private[graft] def embeddingNeardupGuarded(
      spark: SparkSession, dir: String, cap: Long): DataFrame = {
    GraftFunctions.register(spark)
    val e = corpus(spark, dir)
    val n = Tables.cachedCount(spark, dir, "embeddings")
    if (n > cap) {
      graft.Downgrades.record("embedding_neardup", "embedding_neardup_lsh", n, cap)
      return embeddingNeardupLsh(spark, dir)
    }
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .select(
        col("vec_a"),
        col("vec_b"),
        Det.detRound(expr("graft_cosine(va, vb)"), 6).as("cos"))
      .orderBy(desc("cos"), asc("vec_a"), asc("vec_b"))
      .limit(20)
  }

  private val embeddingNeardupSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       ${Det.roundSql("list_cosine_similarity(a.v, b.v)", 6)} AS cos
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |ORDER BY cos DESC, vec_a, vec_b
       |LIMIT 20""".stripMargin

  /** LSH-bucketed approximate top-k: corpus + queries hashed into
    * (table, bucket) cells by the codegen'd graft_lsh_bucket expression;
    * only same-cell candidates are scored. Rows-only check (approximate
    * by design); recall vs ann_cosine_topk is asserted in SimilaritySpec.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    def bucketed(df: DataFrame, idCol: String, vecCol: String): DataFrame =
      df.select(
        col(idCol),
        col(vecCol),
        explode(expr(
          s"""transform(sequence(0, ${LshTables - 1}),
             |  t -> struct(t AS tbl, graft_lsh_bucket_md5($vecCol, t, $LshPlanes) AS bucket))""".stripMargin))
          .as("lsh"))
        .select(col(idCol), col(vecCol), col("lsh.tbl"), col("lsh.bucket"))

    val c = bucketed(corpus(spark, dir), "vec_id", "embedding")
    val q = bucketed(queries(spark, dir), "q_id", "q_vec")

    val candidates = c
      .join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("q_vec"), col("embedding"))
      .dropDuplicates("q_id", "neighbor_id")

    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    candidates
      .select(
        col("q_id"),
        col("neighbor_id"),
        Det.detRound(expr("graft_cosine(q_vec, embedding)"), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .orderBy(col("q_id"), col("rn"))
  }

  /** IVF-flat approximate top-k: a fixed coarse quantizer (first 16
    * vectors as cell centroids — deterministic, no training loop), each
    * corpus vector assigned to its nearest cell in one broadcast pass
    * (max-of-struct argmax, no shuffle before the cell groupBy), queries
    * probe their 2 nearest cells. The other standard ANN shape next to
    * ann_lsh; recall vs brute force asserted in SimilarityDedupSpec.
    */
  /** The fixed 16-vector coarse quantizer and its assignment/probe
    * kernels — shared by ann_ivf (the served index) and
    * ann_nprobe_curve (the tuning curve that prices it), so a
    * convention change (rounding, tie-break) cannot make the curve
    * measure a different index than the one served.
    */
  private def ivfCents(spark: SparkSession, dir: String): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_vec"))

  /** Per-vector cell assignment. ccos is rounded to 6 dp BEFORE the
    * argmax so cell assignment is engine-portable (the raw last-ulp of
    * a double cosine is not a contract); ties then break on cent_id
    * deterministically (max-of-struct → larger cent_id).
    */
  private def ivfAssigned(spark: SparkSession, dir: String, cents: DataFrame): DataFrame =
    corpus(spark, dir)
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"), col("embedding"), col("cent_id"),
        Det.detRound(expr("graft_cosine(embedding, cent_vec)"), 6).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(
        max(struct(col("ccos"), col("cent_id"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("m.cent_id").as("cell"), col("embedding"))

  /** Per-query cell ranking (rk = 1 is the nearest cell; ties → smaller
    * cell id). Callers pick their probe width by filtering rk.
    */
  private def ivfProbeRanks(spark: SparkSession, dir: String, cents: DataFrame): DataFrame = {
    val wProbe = Window.partitionBy(col("q_id")).orderBy(desc("ccos"), asc("cell"))
    queries(spark, dir)
      .crossJoin(broadcast(cents))
      .select(
        col("q_id"), col("q_vec"), col("cent_id").as("cell"),
        Det.detRound(expr("graft_cosine(q_vec, cent_vec)"), 6).as("ccos"))
      .withColumn("rk", row_number().over(wProbe))
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val cents    = ivfCents(spark, dir)
    val assigned = ivfAssigned(spark, dir, cents)
    val probed = ivfProbeRanks(spark, dir, cents)
      .filter(col("rk") <= 2)
      .select(col("q_id"), col("q_vec"), col("cell"))

    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    assigned
      .join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"),
        col("vec_id").as("neighbor_id"),
        Det.detRound(expr("graft_cosine(q_vec, embedding)"), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .orderBy(col("q_id"), col("rn"))
  }

  /** DuckDB twins of the shared IVF kernels (the SQL side of
    * ivfCents/ivfAssigned/ivfProbeRanks): cents + 6-dp-rounded cell
    * argmax (ties → larger cent_id, mirroring Spark's max-of-struct) +
    * per-query cell ranking (ties → smaller cell). Interpolated by the
    * ann_ivf, ann_recall and ann_nprobe_curve oracles so the three
    * cannot drift; callers pick the probe width via `probeRkMax`.
    * Expects an `e(vec_id, v)` CTE in scope; `probed` keeps its rk
    * column for callers that band by it.
    */
  private def ivfSqlCtes(probeRkMax: Int): String = {
    def r6(e: String) = Det.roundSql(e, 6)
    s"""cents AS (
       |  SELECT vec_id AS cent_id, v AS cvec FROM e WHERE vec_id < 16
       |), assigned AS (
       |  SELECT vec_id, v, cent_id AS cell FROM (
       |    SELECT e.vec_id, e.v, c.cent_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${r6("list_cosine_similarity(e.v, c.cvec)")} DESC, c.cent_id DESC) AS rk
       |    FROM e CROSS JOIN cents c
       |  ) WHERE rk = 1
       |), probed AS (
       |  SELECT q_id, qv, cell, rk FROM (
       |    SELECT q.vec_id AS q_id, q.v AS qv, c.cent_id AS cell,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${r6("list_cosine_similarity(q.v, c.cvec)")} DESC, c.cent_id ASC) AS rk
       |    FROM e q CROSS JOIN cents c WHERE q.vec_id < $NumQueries
       |  ) WHERE rk <= $probeRkMax
       |)""".stripMargin
  }

  /** DuckDB twin of annIvf: the shared kernel CTEs at a 2-cell probe,
    * then the same rounded top-k over probed candidates.
    */
  private val annIvfSql = {
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), ${ivfSqlCtes(2)}, scored AS (
       |  SELECT p.q_id, a.vec_id AS neighbor_id,
       |         ${r6("list_cosine_similarity(p.qv, a.v)")} AS cos
       |  FROM assigned a JOIN probed p ON a.cell = p.cell
       |  WHERE a.vec_id != p.q_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM scored
       |)
       |SELECT q_id, neighbor_id, cos, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin
  }

  /** TRAINED-quantizer IVF (the production vector-index shape): the
    * coarse quantizer is the fixed-init 3-step Lloyd k-means
    * (trainCentroids — the same centroids embedding_kmeans reports),
    * corpus vectors are assigned to their nearest cell by exact L2,
    * each query probes its 2 nearest cells, and candidates are
    * exact-cosine ranked. vs ann_ivf's fixed first-16-vectors
    * quantizer, trained cells track the data distribution — fewer
    * empty/hot cells, better recall per probe. Oracle: the full Lloyd
    * chain + assignment + probe + ranking unrolled in SQL — the
    * training, the index build, and the search all have to agree for
    * the hash to match. At scale: centroids are k·dim broadcast, the
    * index build is one scan, each query touches 2 cells.
    */
  def annIvfTrained(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val k     = 8
    val iters = 3
    val cents = trainCentroids(spark, dir, k, iters)
    val e = corpus(spark, dir)
      .select(
        col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val assigned = kmeansAssign(spark, e.select(col("vec_id"), col("v")), cents)
      .join(corpus(spark, dir), "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"))
    import spark.implicits._
    val centsDf = broadcast(cents.toDF("cent_id", "cent_vec"))
    ivfProbeRank(spark, dir, assigned, centsDf)
  }

  /** The IVF serve path, shared by the in-plan (ann_ivf_trained) and
    * stored-index (ann_ivf_stored) variants: each query picks its 2
    * nearest cells from the tiny broadcast centroid frame, candidates
    * come from exactly those cells, exact cosine ranks them.
    */
  private def ivfProbeRank(
      spark: SparkSession, dir: String,
      assigned: DataFrame, centsDf: DataFrame): DataFrame = {
    val wProbe = Window.partitionBy(col("q_id")).orderBy(asc("d2"), asc("cell"))
    val probed = queries(spark, dir)
      .select(
        col("q_id"), col("q_vec"),
        expr("transform(q_vec, x -> CAST(x AS DOUBLE))").as("v"))
      .crossJoin(centsDf)
      .select(
        col("q_id"), col("q_vec"), col("cent_id").as("cell"),
        expr(KmeansDistExpr).as("d2"))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= 2)
      .select(col("q_id"), col("q_vec"), col("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    assigned
      .join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"),
        col("vec_id").as("neighbor_id"),
        Det.detRound(expr("graft_cosine(q_vec, embedding)"), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .orderBy(col("q_id"), col("rn"))
  }

  /** Persist `df` under `out/$sub` plus its as-written schema as a
    * sidecar (`$sub.schema.json`): serve paths read the stamp back
    * instead of hard-coding column widths, so a tolerated source-schema
    * drift (int32 vec_id, array<double> embedding) can never break a
    * stored-index read while the class-level canary stays green.
    */
  private def writeStored(
      df: DataFrame, out: String, sub: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(s"$out/$sub")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/$sub.schema.json"),
      df.schema.json.getBytes("UTF-8"))
    ()
  }

  private def readStoredSchema(
      idx: String, sub: String,
      fallback: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    try org.apache.spark.sql.types.DataType.fromJson(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$idx/$sub.schema.json")), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    catch { case _: Exception => fallback }

  /** Stored-index IVF — the index-build/serve split of a production
    * vector store (the ANN analog of dedup_incremental's stored base
    * index): the trained quantizer and the cell-partitioned corpus
    * assignment are built ONCE and persisted via DerivedCache (keyed by
    * corpus rows + quantizer params, source-stamp invalidated), and the
    * serve path reads back only what it probes — the cells directory is
    * `partitionBy(cell)`, so the probed-cells join prunes to 2 of k
    * partition directories per query batch instead of re-scanning and
    * re-assigning the corpus. Results are identical to ann_ivf_trained
    * (same oracle); what changes is WHERE the cost lives: build once ∝
    * corpus, serve ∝ probed cells.
    */
  def annIvfStored(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val k = 8; val iters = 3
    val rows = Tables.cachedCount(spark, dir, "embeddings")
    val idx = graft.sources.DerivedCache.dir(
      dir, "ann-ivf", s"rows=$rows;k=$k;iters=$iters") { out =>
      import spark.implicits._
      def writeWithSchema(df: DataFrame, sub: String, partitionCols: Seq[String]): Unit =
        writeStored(df, out, sub, partitionCols)
      val cents = trainCentroids(spark, dir, k, iters)
      writeWithSchema(cents.toDF("cent_id", "cent_vec"), "cents", Nil)
      val e = corpus(spark, dir).select(
        col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      writeWithSchema(
        kmeansAssign(spark, e, cents)
          .join(corpus(spark, dir), "vec_id")
          .select(col("vec_id"), col("embedding"), col("cell")),
        "cells", Seq("cell"))
      ()
    }
    // explicit read schemas (an EMPTY corpus stores an index with no
    // parquet data files, and schema inference would throw where every
    // other query degrades to an empty result — EmptyInputSpec
    // contract), loaded from the build-time stamp so they always match
    // what was actually written; the literal fallback covers caches
    // built before the stamp existed.
    import org.apache.spark.sql.types._
    def storedSchema(sub: String, fallback: StructType): StructType =
      readStoredSchema(idx, sub, fallback)
    val centsDf = broadcast(spark.read
      .schema(storedSchema("cents", StructType(Seq(
        StructField("cent_id", IntegerType),
        StructField("cent_vec", ArrayType(DoubleType))))))
      .parquet(s"$idx/cents"))
    val assigned = spark.read
      .schema(storedSchema("cells", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("cell", IntegerType)))))
      .parquet(s"$idx/cells")
    ivfProbeRank(spark, dir, assigned, centsDf)
  }

  private val annIvfTrainedSql = {
    val iters = 3
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH ${kmeansChainSql(8, iters)},
       |${kmeansAssignCte("assigned", s"c$iters")},
       |probed AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.vec_id AS q_id, q.v AS qv, c.cent_id AS cell,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${kmeansD2Sql("q.v", "c.cvec")} ASC, c.cent_id ASC) AS rk
       |    FROM e q CROSS JOIN c$iters c WHERE q.vec_id < $NumQueries
       |  ) WHERE rk <= 2
       |), scored AS (
       |  SELECT p.q_id, a.vec_id AS neighbor_id,
       |         ${r6("list_cosine_similarity(p.qv, a.v)")} AS cos
       |  FROM assigned a JOIN probed p ON a.cell = p.cell
       |  WHERE a.vec_id != p.q_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM scored
       |)
       |SELECT q_id, neighbor_id, cos, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin
  }

  /** Scale path for embedding near-dup: LSH-bucketed candidate pairs
    * instead of the all-pairs cross join (embedding_neardup is O(n²) —
    * correct as the small-corpus oracle baseline, unusable at 100 TB).
    * Vectors hash into 16 tables × 4 hyperplanes; within each
    * (table, bucket) cell the i<j pairs are expanded in-row from a
    * size-capped sorted posting list (same shape as dedup_minhash),
    * deduplicated across tables, then exactly cosine-scored. Rows-only
    * check; recall vs the brute-force top pairs is spec-asserted.
    */
  def embeddingNeardupLsh(spark: SparkSession, dir: String): DataFrame =
    lshScoredPairs(spark, dir)
      .orderBy(desc("cos"), asc("vec_a"), asc("vec_b"))
      .limit(20)

  /** The un-limited LSH candidate pair set with exact cosine scores —
    * the frame embedding_neardup_lsh projects its top-20 from, and the
    * edge source for embedding_clusters (which must see EVERY candidate
    * pair above its threshold, not a display-size cut).
    */
  def lshScoredPairs(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val tables = 16
    val planes = 4
    val bucketCap = 200
    val e = corpus(spark, dir)
    val buckets = e
      .select(
        col("vec_id"),
        explode(expr(
          s"""transform(sequence(0, ${tables - 1}),
             |  t -> struct(t AS tbl, graft_lsh_bucket_md5(embedding, t, $planes) AS bucket))""".stripMargin))
          .as("lsh"))
      .select(col("vec_id"), col("lsh.tbl"), col("lsh.bucket"))
    // The bucket frame is tables·2^planes rows (256 here) REGARDLESS of
    // corpus size, so AQE coalesces it to a handful of tasks — and the
    // in-row pair expansion below then emits its ≤ C(bucketCap,2)·256
    // pair stream from those few tasks (LshProbe measured the distinct
    // over the 2M-pair stream at ~1.0 s because its map side was ~4
    // tasks). Spreading the tiny bucket frame across the shuffle width
    // first is the same volume-aware re-key pairCommonOf uses: the
    // optimizer sizes stages by SHUFFLED bytes and cannot see what a
    // generator will emit. Bounded at any scale (the frame is
    // bucket-count-sized by construction).
    val width = spark.sessionState.conf.numShufflePartitions
    val pairs = buckets
      .groupBy(col("tbl"), col("bucket"))
      .agg(slice(sort_array(collect_list(col("vec_id"))), 1, bucketCap).as("ids"))
      .repartition(width)
      .select(posexplode(col("ids")).as(Seq("i", "vec_a")), col("ids"))
      .select(col("vec_a"), explode(expr("slice(ids, i + 2, size(ids))")).as("vec_b"))
      .distinct()
    val va = e.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val vb = e.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    pairs
      .join(va, "vec_a")
      .join(vb, "vec_b")
      .select(
        col("vec_a"), col("vec_b"),
        Det.detRound(expr("graft_cosine(va, vb)"), 6).as("cos"))
  }

  /** Shared CTE prefix of the LSH oracles: the md5-derived ±1 sign
    * lists (LshBucketMd5.signOf's SQL twin), per-(vector, table, plane)
    * dot products folded in element order — the same left-to-right
    * double accumulation as the kernel's loop — and the resulting
    * bucket codes. Embeddings are 64-dimensional (generate_series
    * bound); the kernel reads the true vector length.
    */
  private def lshSqlPrefix(tables: Int, planes: Int): String =
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), signs AS (
       |  SELECT t, p,
       |         list(CASE WHEN (('0x' || substr(md5(t || '_' || p || '_' || d), 1, 8))::BIGINT & 1) = 1
       |                   THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END ORDER BY d) AS sv
       |  FROM (SELECT unnest(generate_series(0, ${tables - 1})) AS t),
       |       (SELECT unnest(generate_series(0, ${planes - 1})) AS p),
       |       (SELECT unnest(generate_series(0, 63)) AS d)
       |  GROUP BY t, p
       |), dots AS (
       |  SELECT e.vec_id, s.t AS tbl, s.p,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(generate_series(1, len(e.v)), i -> e.v[i] * s.sv[i])),
       |           (a, b) -> a + b) AS dot
       |  FROM e CROSS JOIN signs s
       |), bck AS (
       |  SELECT vec_id, tbl,
       |         CAST(SUM(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
       |  FROM dots GROUP BY vec_id, tbl
       |)""".stripMargin

  /** DuckDB twin of annLsh: identical buckets from the portable sign
    * matrix, same-cell candidates, rounded exact cosine, top-k.
    */
  private val annLshSql = {
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH ${lshSqlPrefix(LshTables, LshPlanes)},
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
       |  FROM bck c JOIN bck q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |  WHERE q.vec_id < $NumQueries AND c.vec_id != q.vec_id
       |), scored AS (
       |  SELECT cand.q_id, cand.neighbor_id,
       |         ${r6("list_cosine_similarity(qe.v, ce.v)")} AS cos
       |  FROM cand
       |  JOIN e qe ON cand.q_id = qe.vec_id
       |  JOIN e ce ON cand.neighbor_id = ce.vec_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM scored
       |)
       |SELECT q_id, neighbor_id, cos, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin
  }

  /** CTE chain producing the scored LSH candidate PAIRS of
    * lshScoredPairs (16 tables × 4 planes, bucket cap 200) — shared by
    * the embedding_neardup_lsh oracle and Graph's embedding_clusters
    * oracle.
    */
  private[operators] def lshPairsSqlChain: String =
    s"""${lshSqlPrefix(16, 4)},
       |lbuck AS (
       |  SELECT tbl, bucket, list_slice(list_sort(list(vec_id)), 1, 200) AS ids
       |  FROM bck GROUP BY tbl, bucket
       |), lpairs AS (
       |  SELECT DISTINCT a.x AS vec_a, b.x AS vec_b
       |  FROM lbuck, unnest(ids) AS a(x), unnest(ids) AS b(x)
       |  WHERE a.x < b.x
       |), lscored AS (
       |  SELECT p.vec_a, p.vec_b,
       |         ${Det.roundSql("list_cosine_similarity(ea.v, eb.v)", 6)} AS cos
       |  FROM lpairs p
       |  JOIN e ea ON p.vec_a = ea.vec_id
       |  JOIN e eb ON p.vec_b = eb.vec_id
       |)""".stripMargin

  private val embeddingNeardupLshSql =
    s"""WITH $lshPairsSqlChain
       |SELECT vec_a, vec_b, cos FROM lscored
       |ORDER BY cos DESC, vec_a, vec_b
       |LIMIT 20""".stripMargin

  /** Curve notches spanning the synthetic corpus's actual candidate
    * cosine range (top LSH pairs land ≈0.44–0.51 at every SF; a
    * production text-embedding corpus would move this toward 0.8–0.99,
    * which is a parameter change, not a shape change).
    */
  private val CurveThresholds: Seq[Double] = (30 to 48 by 2).map(_ / 100.0)

  /** Near-dup threshold-yield curve: for each cosine threshold, how
    * many candidate pairs clear it and how many documents a
    * keep-lowest-id dedup would drop — the tuning view an operator
    * reads to PRICE each threshold notch before committing a full
    * dedup run over the corpus. One pass over the bucketed LSH
    * candidate set (never all-pairs); each pair fans out only to the
    * thresholds it clears, ≤ |curve| rows per pair, then a tiny
    * per-threshold aggregate.
    */
  def neardupThresholdCurve(spark: SparkSession, dir: String): DataFrame = {
    lshScoredPairs(spark, dir)
      .select(
        col("vec_b"), col("cos"),
        explode(array(CurveThresholds.map(lit): _*)).as("threshold"))
      .filter(col("cos") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("vec_b")).as("n_docs_dropped"))
      .orderBy(col("threshold"))
  }

  private val neardupThresholdCurveSql = {
    val arr = CurveThresholds.map(t => f"$t%.2f").mkString("[", ", ", "]")
    s"""WITH $lshPairsSqlChain,
       |curve AS (SELECT CAST(unnest($arr) AS DOUBLE) AS threshold)
       |SELECT c.threshold,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(count(DISTINCT s.vec_b) AS BIGINT) AS n_docs_dropped
       |FROM lscored s JOIN curve c ON s.cos >= c.threshold
       |GROUP BY c.threshold
       |ORDER BY c.threshold""".stripMargin
  }

  /** Distributed Lloyd's k-means over the embedding corpus (k = 8,
    * 3 iterations, deterministic init = the k lowest vec_ids) — the
    * trained-quantizer counterpart to ann_ivf's fixed coarse quantizer.
    *
    * Per iteration: centroids broadcast → in-row squared-L2 argmin
    * (min-of-struct, codegen'd — no shuffle) → dimension-exploded
    * DECIMAL mean (exact, partition-order-invariant) → k×dim rows to
    * the driver. This is exactly the MLlib KMeans dataflow shape (scan
    * corpus once per iteration, reduce k×dim numbers), so it scales to
    * any corpus a cluster can scan; determinism comes from the exact
    * decimal sums. Output is cluster sizes + within-cluster inertia.
    * Rows-only check (no SQL analog); invariants asserted in
    * SimilaritySpec round 2.
    */
  private val KmeansDistExpr =
    "aggregate(zip_with(v, cent_vec, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x)"

  /** Min-d2 cell assignment of `e` (vec_id, v: double[]) against a tiny
    * broadcast centroid list; ties break to the smaller cent_id — the
    * contract every kmeans/IVF oracle mirrors.
    */
  private def kmeansAssign(
      spark: SparkSession, e: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    val centsDf = broadcast(cents.toDF("cent_id", "cent_vec"))
    e.crossJoin(centsDf)
      .select(
        col("vec_id"), col("v"), col("cent_id"),
        expr(KmeansDistExpr).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cent_id"))).as("m"), first(col("v")).as("v"))
      .select(col("vec_id"), col("m.cent_id").as("cell"), col("m.d2").as("d2"), col("v"))
  }

  /** JVM-lifetime memo of trained quantizers (k·dim doubles each),
    * backed by a PERSISTED model file (DerivedCache): training is
    * deterministic in (dir, k, iters), so the Lloyd run is paid once
    * EVER per corpus — the model-registry shape a production pipeline
    * uses (train once, serve many). Every consumer in any later JVM
    * (embedding_kmeans, ann_ivf_trained, the IVF/PQ builders, the
    * nprobe curve) reads back the k·dim model instead of re-training —
    * this is what keeps ann_ivf_trained's cost order-independent in a
    * fresh bench JVM instead of "cheap only if embedding_kmeans ran
    * first". Doubles are stored as raw long bits, so the round-trip is
    * bit-exact and the served model is indistinguishable from a fresh
    * train. A concurrent duplicate just retrains identically; the map
    * only ever holds tiny k·dim arrays.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Int, Int), Seq[(Int, Seq[Double])]]()

  private def trainCentroids(
      spark: SparkSession, dir: String,
      k: Int, iters: Int): Seq[(Int, Seq[Double])] =
    // key carries the embeddings file-metadata stamp so an in-place
    // testdata regeneration retrains instead of serving stale centroids
    centroidCache.computeIfAbsent(
      (dir, graft.sources.DerivedCache.sourceStamp(s"$dir/embeddings.parquet"),
        k, iters),
      _ => {
        val model = graft.sources.DerivedCache.dir(
          dir, "kmeans-model", s"k=$k;iters=$iters") { out =>
          val cents = trainCentroidsImpl(spark, dir, k, iters)
          val lines = cents.map { case (c, v) =>
            s"$c\t${v.map(java.lang.Double.doubleToLongBits).mkString(",")}"
          }
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$out/centroids.tsv"),
            lines.mkString("\n").getBytes("UTF-8"))
          ()
        }
        try {
          val txt = new String(
            java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(s"$model/centroids.tsv")), "UTF-8")
          txt.split("\n").filter(_.nonEmpty).toSeq.map { line =>
            val Array(c, vs) = line.split("\t", 2)
            (c.toInt,
              if (vs.isEmpty) Seq.empty[Double]
              else vs.split(",").toSeq.map(b =>
                java.lang.Double.longBitsToDouble(b.toLong)))
          }
        } catch {
          // unreadable/torn model file: fall back to a fresh train
          // (identical result) rather than failing the query
          case _: Exception => trainCentroidsImpl(spark, dir, k, iters)
        }
      })

  /** The fixed-init Lloyd loop (first k vectors seed, `iters` steps,
    * exact DECIMAL per-dimension means) — the trained quantizer shared
    * by embedding_kmeans and ann_ivf_trained. k·dim driver collect per
    * step only.
    */
  private def trainCentroidsImpl(
      spark: SparkSession, dir: String,
      k: Int, iters: Int): Seq[(Int, Seq[Double])] =
    trainCentroidsOf(
      spark,
      corpus(spark, dir)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")),
      k, iters)

  /** The Lloyd loop over an arbitrary (vec_id, v: double[]) frame —
    * factored so the incremental index trains on the BASE partition
    * only (the stored quantizer must predate the delta it serves).
    */
  private def trainCentroidsOf(
      spark: SparkSession, e: DataFrame,
      k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    var cents: Seq[(Int, Seq[Double])] = e
      .filter(col("vec_id") < k)
      .orderBy(col("vec_id"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
      .toSeq
    for (_ <- 1 to iters) {
      val means = kmeansAssign(spark, e, cents)
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg((Det.fineSum(col("x")) / count(lit(1))).as("mean"))
        .collect()
      cents = means
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        }
        .toSeq
        .sortBy(_._1)
    }
    cents
  }

  def embeddingKmeans(spark: SparkSession, dir: String): DataFrame = {
    val k     = 8
    val iters = 3
    val e = corpus(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val cents = trainCentroids(spark, dir, k, iters)
    kmeansAssign(spark, e, cents)
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_points"),
        Det.detRound(Det.fineSum(col("d2")), 6).as("inertia"))
      .orderBy(col("cell"))
  }

  /** DuckDB twin of embeddingKmeans: the 3 Lloyd iterations unrolled as
    * chained CTEs. Exactness contract mirrored step for step: d2 is the
    * same left-to-right double fold Spark's aggregate(zip_with(...))
    * performs, per-dimension means are exact DECIMAL(30,10) sums cast to
    * double, argmin ties break on cent_id ascending (Spark's
    * min-of-struct).
    */
  private def kmeansD2Sql(v: String, c: String) =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($v)), i -> ($v[i] - $c[i]) * ($v[i] - $c[i]))), (a, b) -> a + b)"

  private def kmeansAssignCte(name: String, centsCte: String, src: String = "e") =
    s"""$name AS (
       |  SELECT vec_id, v, cell, d2 FROM (
       |    SELECT $src.vec_id, $src.v, c.cent_id AS cell, ${kmeansD2Sql(s"$src.v", "c.cvec")} AS d2,
       |           row_number() OVER (PARTITION BY $src.vec_id
       |             ORDER BY ${kmeansD2Sql(s"$src.v", "c.cvec")} ASC, c.cent_id ASC) AS rk
       |    FROM $src CROSS JOIN $centsCte c
       |  ) WHERE rk = 1
       |)""".stripMargin

  /** Shared CTE chain of the kmeans/trained-IVF oracles: e (double
    * vectors), c0 (first-k seed), a1/c1 … a{iters}/c{iters} Lloyd
    * steps. Terminal centroids live in CTE c{iters}. `src` picks the
    * training population (default the whole corpus; the incremental
    * index trains on its base partition — seeds stay the first k of
    * `src`).
    */
  private def kmeansChainSql(
      k: Int, iters: Int, src: String = "e", srcFilter: String = ""): String = {
    def centsCte(name: String, assignCteName: String) =
      s"""$name AS (
         |  SELECT cell AS cent_id, list(mean ORDER BY dim) AS cvec FROM (
         |    SELECT cell, dim, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mean
         |    FROM (SELECT cell, unnest(generate_series(1, len(v))) AS dim, unnest(v) AS x
         |          FROM $assignCteName)
         |    GROUP BY cell, dim
         |  ) GROUP BY cell
         |)""".stripMargin
    val chain = (1 to iters)
      .flatMap(i => Seq(kmeansAssignCte(s"a$i", s"c${i - 1}", src), centsCte(s"c$i", s"a$i")))
      .mkString(",\n")
    val srcDef =
      if (src == "e") ""
      else s"""
              |), $src AS (
              |  SELECT vec_id, v FROM e WHERE $srcFilter""".stripMargin
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings$srcDef
       |), c0 AS (
       |  SELECT vec_id AS cent_id, v AS cvec FROM $src WHERE vec_id < $k
       |),
       |$chain""".stripMargin
  }

  private val embeddingKmeansSql = {
    val iters = 3
    s"""WITH ${kmeansChainSql(8, iters)},
       |${kmeansAssignCte("afinal", s"c$iters")}
       |SELECT cell, count(*) AS n_points,
       |       ${Det.roundSql(s"CAST(SUM(CAST(d2 AS DECIMAL(30,10))) AS DOUBLE)", 6)} AS inertia
       |FROM afinal
       |GROUP BY cell
       |ORDER BY cell""".stripMargin
  }

  /** Embedding-space outlier audit — the vector-side data-quality gate
    * a training pipeline runs before embeddings feed retrieval or
    * curation: every vector is assigned to its trained k-means cell
    * (the STORED quantizer — train once, audit many) and flagged when
    * its squared distance to the centroid exceeds the cell's mean by
    * more than two population standard deviations (compared as
    * (d2−μ)² > 4σ², both sides detRound-pinned, so no sqrt and no
    * cross-engine float seam). Output is the per-cell outlier ledger:
    * point count, outlier count, mean and max d2 — concentrated
    * outliers in one cell = a contaminated source or a broken encoder
    * batch; scattered singletons = ordinary tail mass. Linear: one
    * assignment pass + one broadcast-joined stats pass; the per-cell
    * stats frame is k rows. Oracle: the full Lloyd chain + assignment
    * + the same exact-DECIMAL moment arithmetic unrolled in SQL.
    */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    val k     = 8
    val iters = 3
    val cents = trainCentroids(spark, dir, k, iters)
    val e = corpus(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val assigned = kmeansAssign(spark, e, cents).select(col("cell"), col("d2"))
    val stats = assigned
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("d2").cast(Det.Fine)).cast("double") / count(lit(1))).as("mean"),
        (sum((col("d2") * col("d2")).cast(Det.Fine)).cast("double") / count(lit(1)))
          .as("msq"))
    val scored = assigned
      .join(broadcast(stats), Seq("cell"))
      .withColumn(
        "is_out",
        col("d2") > col("mean") &&
          Det.detRound((col("d2") - col("mean")) * (col("d2") - col("mean")), 6) >
          Det.detRound(lit(4.0) * (col("msq") - col("mean") * col("mean")), 6))
    scored
      .groupBy(col("cell"), col("mean"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"),
        Det.detRound(col("mean"), 6).as("mean_d2"),
        Det.detRound(max(col("d2")), 6).as("max_d2"))
      .drop("mean")
      .orderBy(col("cell"))
  }

  private val embeddingOutliersSql = {
    val iters = 3
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH ${kmeansChainSql(8, iters)},
       |${kmeansAssignCte("afinal", s"c$iters")},
       |stats AS (
       |  SELECT cell, count(*) AS n,
       |         CAST(SUM(CAST(d2 AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mean,
       |         CAST(SUM(CAST(d2 * d2 AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS msq
       |  FROM afinal GROUP BY cell
       |)
       |SELECT a.cell, count(*) AS n_points,
       |       CAST(SUM(CASE WHEN a.d2 > s.mean
       |                      AND ${r6("(a.d2 - s.mean) * (a.d2 - s.mean)")} >
       |                          ${r6("4 * (s.msq - s.mean * s.mean)")}
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |       ${r6("s.mean")} AS mean_d2,
       |       ${r6("MAX(a.d2)")} AS max_d2
       |FROM afinal a JOIN stats s USING (cell)
       |GROUP BY a.cell, s.mean
       |ORDER BY cell""".stripMargin
  }

  /** Encoder-drift audit between two embedding batches — the check a
    * training pipeline runs when an encoder is retrained or upgraded:
    * both batches (old = even vec_id, new = odd, the deterministic
    * stand-in for "yesterday's vectors vs today's") are assigned to the
    * SAME stored quantizer, and each cell reports its population shift and
    * the squared L2 drift of its per-dimension batch means. A healthy
    * re-encode drifts uniformly and keeps cell shares; a broken one
    * moves mass between cells (share_shift) or displaces a cell's
    * centroid (drift2) — caught before the new batch poisons retrieval.
    *
    * Scale: one assignment pass; the per-(cell, dim, half) mean grid is
    * a map-side-partial hash agg collapsing to k·d·2 rows (k=8, d=64)
    * before the shuffle — nothing after the first agg scales with the
    * corpus. Means are exact DECIMAL sums over doubles; drift2 and
    * shares detRound-pinned. A cell missing one batch reports NULL
    * drift (not 0 — absence of evidence), same on both engines.
    */
  def embeddingCentroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val k     = 8
    val iters = 3
    val cents = trainCentroids(spark, dir, k, iters)
    val e = corpus(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val assigned = kmeansAssign(spark, e, cents)
      .withColumn(
        "half",
        when(pmod(col("vec_id"), lit(2L)) === 0L, lit(0L)).otherwise(lit(1L)))
    val counts = assigned
      .groupBy(col("cell"))
      .agg(
        sum(when(col("half") === 0L, 1L).otherwise(0L)).as("n_old"),
        sum(when(col("half") === 1L, 1L).otherwise(0L)).as("n_new"))
    val dimMeans = assigned
      .select(col("cell"), col("half"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"), col("half"))
      .agg((Det.fineSum(col("x")) / count(lit(1))).as("mean"))
    val drift = dimMeans
      .groupBy(col("cell"), col("dim"))
      .agg(
        sum(when(col("half") === 0L, col("mean"))).as("m_old"),
        sum(when(col("half") === 1L, col("mean"))).as("m_new"))
      .groupBy(col("cell"))
      .agg(Det.fineSum(
        (col("m_new") - col("m_old")) * (col("m_new") - col("m_old"))).as("drift2raw"))
    val tot = counts.agg(
      sum(col("n_old")).as("t_old"), sum(col("n_new")).as("t_new"))
    counts
      .join(drift, Seq("cell"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("cell"),
        col("n_old"),
        col("n_new"),
        when(col("t_old") === 0L || col("t_new") === 0L, lit(null).cast("double"))
          .otherwise(Det.detRound(
            col("n_new").cast("double") / col("t_new") -
              col("n_old").cast("double") / col("t_old"), 6)).as("share_shift"),
        Det.detRound(col("drift2raw"), 6).as("drift2"))
      .orderBy(col("cell"))
  }

  private val embeddingCentroidDriftSql = {
    val iters = 3
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH ${kmeansChainSql(8, iters)},
       |${kmeansAssignCte("afinal", s"c$iters")},
       |h AS (
       |  SELECT vec_id, v, cell,
       |         CASE WHEN vec_id % 2 = 0 THEN 0 ELSE 1 END AS half
       |  FROM afinal
       |), counts AS (
       |  SELECT cell,
       |         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
       |         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
       |  FROM h GROUP BY cell
       |), dim_means AS (
       |  SELECT cell, dim, half,
       |         CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mean
       |  FROM (SELECT cell, half, unnest(generate_series(1, len(v))) AS dim,
       |               unnest(v) AS x FROM h)
       |  GROUP BY cell, dim, half
       |), dd AS (
       |  SELECT cell, dim,
       |         SUM(CASE WHEN half = 0 THEN mean END) AS m_old,
       |         SUM(CASE WHEN half = 1 THEN mean END) AS m_new
       |  FROM dim_means GROUP BY cell, dim
       |), drift AS (
       |  SELECT cell, CAST(SUM(CAST((m_new - m_old) * (m_new - m_old)
       |                        AS DECIMAL(30,10))) AS DOUBLE) AS drift2raw
       |  FROM dd GROUP BY cell
       |), tot AS (
       |  SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
       |         CAST(SUM(n_new) AS BIGINT) AS t_new FROM counts
       |)
       |SELECT c.cell, c.n_old, c.n_new,
       |       CASE WHEN t_old = 0 OR t_new = 0 THEN NULL
       |            ELSE ${r6("""CAST(c.n_new AS DOUBLE) / t_new
       |                         - CAST(c.n_old AS DOUBLE) / t_old""")} END AS share_shift,
       |       ${r6("d.drift2raw")} AS drift2
       |FROM counts c
       |LEFT JOIN drift d ON c.cell = d.cell
       |CROSS JOIN tot
       |ORDER BY c.cell""".stripMargin
  }

  /** Per-dimension variance spectrum of the embedding space — the
    * embedding-collapse / effective-dimensionality audit a training
    * pipeline runs on a fresh encoder batch: a healthy encoder spreads
    * variance across dimensions, a collapsed one concentrates it in a
    * few (cum_share hits 0.9 after a handful of dims) and dead
    * dimensions show variance ≈ 0. Output is the spectrum ordered by
    * variance descending: per-dim mean/variance, the dim's share of
    * total variance, and the running cumulative share.
    *
    * Scale: posexplode fans n vectors × d dims, but the hash agg on d
    * keys has map-side partial aggregation — every partition collapses
    * to ≤d rows before the (tiny) shuffle, so the pass is one linear
    * scan at any corpus size. The ordering window runs on the d-row
    * aggregated frame (d = 64), not the corpus. All sums are exact
    * DECIMAL (order-independent), shares detRound-pinned; the running
    * cumulative sum is also DECIMAL so its value is independent of
    * engine-side addition order.
    */
  def embeddingPcaVariance(spark: SparkSession, dir: String): DataFrame = {
    val el = corpus(spark, dir)
      .select(posexplode(col("embedding")))
      .select((col("pos") + 1).cast("long").as("dim"), col("col").cast("double").as("x"))
    val stats = el
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        (Det.fineSum(col("x")) / count(lit(1))).as("mean"),
        (Det.fineSum(col("x") * col("x")) / count(lit(1))).as("msq"))
      .withColumn("variance", Det.detRound(col("msq") - col("mean") * col("mean"), 9))
    val tot = stats.agg(Det.fineSum(col("variance")).as("tv"))
    val w = Window.orderBy(desc("variance"), asc("dim"))
    stats
      .crossJoin(broadcast(tot))
      .withColumn("vrank", row_number().over(w).cast("long"))
      .withColumn("cumvar", sum(col("variance").cast(Det.Fine)).over(w).cast("double"))
      .select(
        col("vrank"),
        col("dim"),
        col("n"),
        Det.detRound(col("mean"), 6).as("mean_x"),
        col("variance"),
        when(col("tv") === 0.0, lit(null).cast("double"))
          .otherwise(Det.detRound(col("variance") / col("tv"), 6)).as("var_share"),
        when(col("tv") === 0.0, lit(null).cast("double"))
          .otherwise(Det.detRound(col("cumvar") / col("tv"), 6)).as("cum_share"))
      .orderBy(col("vrank"))
  }

  private val embeddingPcaVarianceSql = {
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH el AS (
       |  SELECT t.i AS dim, CAST(embedding[t.i] AS DOUBLE) AS x
       |  FROM embeddings,
       |       unnest(generate_series(1, CAST(len(embedding) AS INT))) AS t(i)
       |), stats AS (
       |  SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
       |         CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mean,
       |         CAST(SUM(CAST(x * x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS msq
       |  FROM el GROUP BY dim
       |), v AS (
       |  SELECT dim, n, mean,
       |         ${Det.roundSql("msq - mean * mean", 9)} AS variance
       |  FROM stats
       |), tot AS (
       |  SELECT CAST(SUM(CAST(variance AS DECIMAL(30,10))) AS DOUBLE) AS tv FROM v
       |)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY variance DESC, dim) AS BIGINT) AS vrank,
       |       dim, n, ${r6("mean")} AS mean_x, variance,
       |       CASE WHEN tv = 0 THEN NULL ELSE ${r6("variance / tv")} END AS var_share,
       |       CASE WHEN tv = 0 THEN NULL ELSE
       |         ${r6("""CAST(SUM(CAST(variance AS DECIMAL(30,10)))
       |                 OVER (ORDER BY variance DESC, dim) AS DOUBLE) / tv""")}
       |       END AS cum_share
       |FROM v, tot
       |ORDER BY vrank""".stripMargin
  }

  /** Per-label L2-norm profile of the embedding space — the encoder-drift
    * audit a training pipeline runs when a corpus mixes embedding batches:
    * a re-trained or mis-scaled encoder shifts the norm distribution of
    * its slice, and all-zero vectors (failed encodes) show up in n_zero.
    * Output per label: count, mean/variance/min/max of the vector norm,
    * and the zero-vector count.
    *
    * Scale: the norm is a per-row fold over the embedding array (zero
    * shuffle, linear scan); the groupBy on `label` is a map-side-partial
    * hash agg to a label-cardinality frame. Cross-engine exactness: the
    * sum-of-squares folds left-to-right in ELEMENT ORDER on both engines
    * (the lshSqlPrefix convention), sqrt is IEEE-correctly-rounded in
    * both, the norm is detRound-pinned per vector BEFORE aggregation,
    * and mean/variance accumulate the rounded norms in DECIMAL.
    */
  def embeddingNormProfile(spark: SparkSession, dir: String): DataFrame = {
    val e = corpus(spark, dir)
      .select(
        col("label"),
        Det.detRound(
          sqrt(expr(
            """aggregate(embedding, CAST(0 AS DOUBLE),
              |  (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin)),
          6).as("norm"))
    e.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        (Det.fineSum(col("norm")) / count(lit(1))).as("mean_raw"),
        (Det.fineSum(col("norm") * col("norm")) / count(lit(1))).as("msq"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"))
      .select(
        col("label"),
        col("n_vecs"),
        Det.detRound(col("mean_raw"), 6).as("mean_norm"),
        Det.detRound(col("msq") - col("mean_raw") * col("mean_raw"), 6)
          .as("var_norm"),
        col("min_norm"),
        col("max_norm"),
        col("n_zero"))
      .orderBy(asc_nulls_last("label"))
  }

  private val embeddingNormProfileSql = {
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH e AS (
       |  SELECT label,
       |         ${r6("""sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
       |           (a, b) -> a + b))""")} AS norm
       |  FROM embeddings
       |), agg AS (
       |  SELECT label, count(*) AS n_vecs,
       |         CAST(SUM(CAST(norm AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mean_raw,
       |         CAST(SUM(CAST(norm * norm AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS msq,
       |         min(norm) AS min_norm, max(norm) AS max_norm,
       |         CAST(SUM(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
       |  FROM e GROUP BY label
       |)
       |SELECT label, n_vecs, ${r6("mean_raw")} AS mean_norm,
       |       ${r6("msq - mean_raw * mean_raw")} AS var_norm,
       |       min_norm, max_norm, n_zero
       |FROM agg
       |ORDER BY label NULLS LAST""".stripMargin
  }

  /** Int8 scalar quantization per vector (the vector-store compression
    * step): symmetric scale = max|x|/127, q_i = ⌊x_i/scale + 0.5⌋, with
    * the reconstruction MSE and an order-pinning Σ(i+1)·q_i checksum.
    * Per-row higher-order functions only — zero shuffle, linear at any
    * corpus size. Bit-exact vs DuckDB: the per-element squared errors
    * are cast to DECIMAL before summing (order-independent addition),
    * the same Det discipline as the money sums.
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    emb
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        expr("CAST(array_max(transform(embedding, x -> abs(x))) AS DOUBLE) / 127")
          .as("s"),
        col("embedding"))
      .select(
        col("vec_id"),
        col("n_dims"),
        Det.detRound(col("s"), 8).as("scale"),
        Det.detRound(
          when(col("s") === 0.0, lit(0.0)).otherwise(
            expr(
              """CAST(aggregate(
                |  transform(embedding,
                |    x -> CAST(power(floor(CAST(x AS DOUBLE) / s + 0.5) * s - CAST(x AS DOUBLE), 2)
                |              AS DECIMAL(28, 20))),
                |  CAST(0 AS DECIMAL(30, 20)),
                |  (a, e) -> CAST(a + e AS DECIMAL(30, 20))) AS DOUBLE)""".stripMargin)
              / col("n_dims")),
          12).as("mse"),
        when(col("s") === 0.0, lit(0L)).otherwise(
          expr(
            """aggregate(
              |  zip_with(embedding, sequence(1, size(embedding)),
              |    (x, i) -> i * CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)),
              |  CAST(0 AS BIGINT), (a, e) -> a + e)""".stripMargin))
          .as("q_checksum"))
      .orderBy(col("vec_id"))
  }

  private val embeddingQuantizeSql =
    s"""WITH base AS (
       |  SELECT vec_id,
       |         CAST(len(embedding) AS BIGINT) AS n_dims,
       |         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) / 127 AS s,
       |         embedding
       |  FROM embeddings
       |), el AS (
       |  SELECT vec_id, n_dims, s, t.i, CAST(embedding[t.i] AS DOUBLE) AS x
       |  FROM base, unnest(generate_series(1, CAST(n_dims AS INT))) AS t(i)
       |)
       |SELECT vec_id, n_dims,
       |       ${Det.roundSql("any_value(s)", 8)} AS scale,
       |       CASE WHEN any_value(s) = 0 THEN 0.0 ELSE
       |         ${Det.roundSql(
          "CAST(SUM(CAST(power(floor(x / s + 0.5) * s - x, 2) AS DECIMAL(28, 20))) AS DOUBLE) / n_dims",
          12)}
       |       END AS mse,
       |       CASE WHEN any_value(s) = 0 THEN 0 ELSE
       |         CAST(SUM(i * CAST(floor(x / s + 0.5) AS BIGINT)) AS BIGINT)
       |       END AS q_checksum
       |FROM el
       |GROUP BY vec_id, n_dims
       |ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------ semantic dedup

  private val SemTau = 0.38
  private[graft] val SemanticCap = 20000L

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication" — public knowledge): cluster the embeddings with the
    * trained k-means quantizer (shared, memoized trainer — the same
    * centroids embedding_kmeans / ann_ivf_trained serve), then drop a
    * vector when it is ≥ τ cosine-similar to an earlier-ranked member of
    * ITS OWN cluster, rank = distance-to-centroid ascending (ties on
    * vec_id). Greedy against earlier-ranked members regardless of their
    * own verdict — deterministic, one join, no iteration; the kept set
    * is exactly "members with no closer-to-centroid semantic twin".
    *
    * Scale: the within-cluster pair join is quadratic in CLUSTER size by
    * design — SemDeDup's contract is k ∝ corpus so clusters stay
    * O(constant). The oracle pins k=8, so past SemanticCap the candidate
    * set downgrades to the LSH-bucketed pair stream (lshScoredPairs:
    * capped buckets, subquadratic) intersected with same-cell — same
    * verdict shape, approximate recall, recorded via Downgrades.
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedupGuarded(spark, dir, SemanticCap)

  private[graft] def semanticDedupGuarded(
      spark: SparkSession, dir: String, cap: Long): DataFrame = {
    GraftFunctions.register(spark)
    val k     = 8
    val iters = 3
    val cents = trainCentroids(spark, dir, k, iters)
    val e = corpus(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val wRank = Window.partitionBy(col("cell")).orderBy(asc("d2"), asc("vec_id"))
    // graft_cosine reads FLOAT arrays (and accumulates in double — the
    // exact arithmetic DuckDB does on CAST(embedding AS DOUBLE[])), so
    // carry the original float vectors through, not the double copies
    val ranked = kmeansAssign(spark, e, cents)
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .join(corpus(spark, dir).select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("cell"), col("rk"), col("embedding"))

    val n = Tables.cachedCount(spark, dir, "embeddings")
    val pairs =
      if (n <= cap) {
        // exact within-cluster candidate set
        val a = ranked.select(
          col("cell"), col("rk").as("rk_a"), col("vec_id").as("cand_id"),
          col("embedding").as("va"))
        val b = ranked.select(
          col("cell"), col("rk").as("rk_b"), col("vec_id"),
          col("embedding").as("vb"))
        b.join(a, Seq("cell"))
          .filter(col("rk_a") < col("rk_b"))
          .select(
            col("vec_id"), col("rk_a"), col("cand_id"),
            Det.detRound(expr("graft_cosine(va, vb)"), 6).as("cos"))
      } else {
        graft.Downgrades.record("semantic_dedup", "lsh-bucketed candidates", n, cap)
        val ra = ranked.select(
          col("vec_id").as("vec_a"), col("cell").as("cell_a"), col("rk").as("rka"))
        val rb = ranked.select(
          col("vec_id").as("vec_b"), col("cell").as("cell_b"), col("rk").as("rkb"))
        lshScoredPairs(spark, dir)
          .join(ra, "vec_a")
          .join(rb, "vec_b")
          .filter(col("cell_a") === col("cell_b"))
          .select(
            // orient: lower-ranked member is the keep candidate
            when(col("rka") < col("rkb"), col("vec_b")).otherwise(col("vec_a")).as("vec_id"),
            least(col("rka"), col("rkb")).as("rk_a"),
            when(col("rka") < col("rkb"), col("vec_a")).otherwise(col("vec_b")).as("cand_id"),
            col("cos"))
      }

    val best = pairs
      .filter(col("cos") >= SemTau)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("rk_a"), col("cand_id"), col("cos"))).as("m"))
      .select(
        col("vec_id"),
        col("m.cand_id").as("matched_id"),
        col("m.cos").as("match_cos"))
    ranked
      .join(best, Seq("vec_id"), "left")
      .select(
        col("vec_id"), col("cell"), col("rk"),
        when(col("matched_id").isNull, "keep").otherwise("drop").as("verdict"),
        col("matched_id"), col("match_cos"))
      .orderBy(col("vec_id"))
  }

  private val semanticDedupSql = {
    val iters = 3
    s"""WITH ${kmeansChainSql(8, iters)},
       |${kmeansAssignCte("afinal", s"c$iters")},
       |ranked AS (
       |  SELECT vec_id, cell, v,
       |         row_number() OVER (PARTITION BY cell ORDER BY d2 ASC, vec_id ASC) AS rk
       |  FROM afinal
       |), pairs AS (
       |  SELECT b.vec_id, a.rk AS rk_a, a.vec_id AS cand_id,
       |         ${Det.roundSql("list_cosine_similarity(a.v, b.v)", 6)} AS cos
       |  FROM ranked b JOIN ranked a ON a.cell = b.cell AND a.rk < b.rk
       |), best AS (
       |  SELECT vec_id, cand_id AS matched_id, cos AS match_cos
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY rk_a ASC) AS pick
       |        FROM pairs WHERE cos >= $SemTau)
       |  WHERE pick = 1
       |)
       |SELECT r.vec_id, r.cell, r.rk,
       |       CASE WHEN m.matched_id IS NULL THEN 'keep' ELSE 'drop' END AS verdict,
       |       m.matched_id, m.match_cos
       |FROM ranked r LEFT JOIN best m USING (vec_id)
       |ORDER BY r.vec_id""".stripMargin
  }

  /** ANN quality observability: recall@k of each approximate search
    * path (ann_lsh, ann_ivf, ann_pq) against the exact brute-force anchor
    * (ann_cosine_topk ground truth), per query vector — the measurement
    * that prices a probe/table setting before trusting it on a real
    * corpus (neardup_threshold_curve gives yield; this gives quality).
    * recall = |approx top-k ∩ exact top-k| / |exact top-k|. All frames
    * involved are query-batch sized (≤ NumQueries·TopK rows), so the
    * comparison costs nothing beyond the two approximate searches and
    * the capped exact anchor it grades.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    // exact feeds four consumers (three per-method joins + the
    // denominators) — the STORED ground-truth anchor (build-once
    // parquet) serves all of them without a per-run brute-force pass
    val exact = annExactStored(spark, dir)
      .select(col("q_id"), col("neighbor_id"))
    val exactN = exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
    def recallOf(method: String, approx: DataFrame): DataFrame = {
      val hits = approx
        .select(col("q_id"), col("neighbor_id"))
        .join(exact, Seq("q_id", "neighbor_id"))
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_hit"))
      exactN
        .join(hits, Seq("q_id"), "left")
        .select(
          lit(method).as("method"),
          col("q_id"),
          col("n_exact"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          Det.detRound(
            coalesce(col("n_hit"), lit(0L)).cast("double") /
              col("n_exact").cast("double"), 6).as("recall"))
    }
    recallOf("ann_ivf", annIvf(spark, dir))
      .unionAll(recallOf("ann_lsh", annLsh(spark, dir)))
      .unionAll(recallOf("ann_pq", annPq(spark, dir)))
      .orderBy(col("method"), col("q_id"))
  }

  /** DuckDB twin of annRecall: the exact anchor, the LSH candidate
    * chain (lshSqlPrefix — same portable sign matrix as the ann_lsh
    * oracle), and the fixed-quantizer IVF chain, intersected per query.
    */
  private val annRecallSql = {
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH ${lshSqlPrefix(LshTables, LshPlanes)},
       |x_rank AS (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |           ${r6("list_cosine_similarity(q.v, c.v)")} AS cos
       |    FROM e q JOIN e c ON c.vec_id != q.vec_id
       |    WHERE q.vec_id < $NumQueries
       |  )
       |), exact AS (
       |  SELECT q_id, neighbor_id FROM x_rank WHERE rn <= $TopK
       |), exact_n AS (
       |  SELECT q_id, count(*) AS n_exact FROM exact GROUP BY q_id
       |), l_rank AS (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT cand.q_id, cand.neighbor_id,
       |           ${r6("list_cosine_similarity(qe.v, ce.v)")} AS cos
       |    FROM (
       |      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
       |      FROM bck c JOIN bck q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |      WHERE q.vec_id < $NumQueries AND c.vec_id != q.vec_id
       |    ) cand
       |    JOIN e qe ON cand.q_id = qe.vec_id
       |    JOIN e ce ON cand.neighbor_id = ce.vec_id
       |  )
       |), lsh AS (
       |  SELECT q_id, neighbor_id FROM l_rank WHERE rn <= $TopK
       |), ${ivfSqlCtes(2)}, i_rank AS (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT p.q_id, a.vec_id AS neighbor_id,
       |           ${r6("list_cosine_similarity(p.qv, a.v)")} AS cos
       |    FROM assigned a JOIN probed p ON a.cell = p.cell
       |    WHERE a.vec_id != p.q_id
       |  )
       |), ivf AS (
       |  SELECT q_id, neighbor_id FROM i_rank WHERE rn <= $TopK
       |),
       |$pqSqlChain,
       |pq AS (
       |  SELECT q_id, neighbor_id FROM pq_rank WHERE rn <= $TopK
       |), hit_l AS (
       |  SELECT q_id, count(*) AS n_hit FROM lsh JOIN exact USING (q_id, neighbor_id) GROUP BY q_id
       |), hit_i AS (
       |  SELECT q_id, count(*) AS n_hit FROM ivf JOIN exact USING (q_id, neighbor_id) GROUP BY q_id
       |), hit_p AS (
       |  SELECT q_id, count(*) AS n_hit FROM pq JOIN exact USING (q_id, neighbor_id) GROUP BY q_id
       |)
       |SELECT method, q_id, n_exact, n_hit,
       |       ${r6("CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE)")} AS recall
       |FROM (
       |  SELECT 'ann_ivf' AS method, en.q_id, en.n_exact, COALESCE(h.n_hit, 0) AS n_hit
       |  FROM exact_n en LEFT JOIN hit_i h USING (q_id)
       |  UNION ALL
       |  SELECT 'ann_lsh' AS method, en.q_id, en.n_exact, COALESCE(h.n_hit, 0) AS n_hit
       |  FROM exact_n en LEFT JOIN hit_l h USING (q_id)
       |  UNION ALL
       |  SELECT 'ann_pq' AS method, en.q_id, en.n_exact, COALESCE(h.n_hit, 0) AS n_hit
       |  FROM exact_n en LEFT JOIN hit_p h USING (q_id)
       |)
       |ORDER BY method, q_id""".stripMargin
  }

  /** Rank-aware retrieval quality: MRR and binary-relevance NDCG@k of
    * each approximate search path against the stored exact anchor —
    * recall@k ([[annRecall]]) says how many true neighbors surface;
    * this says WHERE they surface in the approximate ranking, which is
    * what a RAG serving stack actually pays for (a true neighbor at
    * rank 10 is nearly worthless at answer time). relevant = exact
    * top-k set; RR = 1/rank of the first relevant item in the approx
    * list (0 when none); DCG = Σ 1/log2(rank+1) over relevant hits,
    * IDCG over the first min(k, |relevant|) positions.
    *
    * Exactness: each log term is quantized to DECIMAL(30,10) before
    * summation (the lm_score convention — last-ulp libm differences
    * vanish in the cast and DECIMAL addition is order-independent);
    * MRR's 1/rank is exact IEEE division on both engines; final ratios
    * detRound-pinned. Scale: every frame here is query-batch sized
    * (≤ NumQueries·TopK rows) — the eval costs nothing beyond the
    * searches it grades, and the anchor is the build-once stored
    * ground-truth table.
    */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val exact = annExactStored(spark, dir)
      .select(col("q_id"), col("neighbor_id"))
    val exactN = exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
    def dcgTerm(r: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (lit(1.0) / (log(r.cast("double") + lit(1.0)) / log(lit(2.0)))).cast(Det.Fine)
    val ideal = exactN
      .select(col("q_id"), explode(expr(s"sequence(1, least(n_exact, $TopK))")).as("i"))
      .groupBy(col("q_id"))
      .agg(sum(dcgTerm(col("i"))).as("idcg"))
    def evalOf(method: String, approx: DataFrame): DataFrame = {
      val met = approx
        .select(col("q_id"), col("neighbor_id"), col("rn"))
        .join(exact, Seq("q_id", "neighbor_id"))
        .groupBy(col("q_id"))
        .agg(
          count(lit(1)).as("n_hit"),
          min(col("rn")).as("first_rel"),
          sum(dcgTerm(col("rn"))).as("dcg"))
      exactN
        .join(ideal, Seq("q_id"), "left")
        .join(met, Seq("q_id"), "left")
        .select(
          lit(method).as("method"),
          col("q_id"),
          col("n_exact"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          Det.detRound(
            coalesce(lit(1.0) / col("first_rel").cast("double"), lit(0.0)), 6).as("mrr"),
          when(col("idcg").isNull || col("idcg") === lit(0).cast(Det.Fine),
            lit(null).cast("double"))
            .otherwise(Det.detRound(
              coalesce(col("dcg"), lit(0).cast(Det.Fine)).cast("double") /
                col("idcg").cast("double"), 6)).as("ndcg"))
    }
    evalOf("ann_ivf", annIvf(spark, dir))
      .unionAll(evalOf("ann_lsh", annLsh(spark, dir)))
      .unionAll(evalOf("ann_pq", annPq(spark, dir)))
      .orderBy(col("method"), col("q_id"))
  }

  /** DuckDB twin of retrievalEval: the annRecall CTE skeleton (same
    * exact anchor, LSH/IVF/PQ chains) with ranks kept through the
    * top-k cut and the MRR/DCG folds replayed term-for-term.
    */
  private val retrievalEvalSql = {
    def r6(e: String) = Det.roundSql(e, 6)
    def dcgT(r: String) =
      s"CAST(1.0 / (ln($r + 1.0) / ln(2.0)) AS DECIMAL(30,10))"
    def metCte(src: String) =
      s"""SELECT q_id, count(*) AS n_hit, MIN(rn) AS first_rel,
         |         SUM(${dcgT("rn")}) AS dcg
         |  FROM (SELECT s.q_id, s.rn FROM $src s JOIN exact x
         |        ON s.q_id = x.q_id AND s.neighbor_id = x.neighbor_id)
         |  GROUP BY q_id""".stripMargin
    def armSql(method: String, met: String) =
      s"""SELECT '$method' AS method, en.q_id, en.n_exact,
         |       COALESCE(m.n_hit, 0) AS n_hit, m.first_rel, m.dcg, i.idcg
         |FROM exact_n en
         |LEFT JOIN ideal i USING (q_id)
         |LEFT JOIN $met m USING (q_id)""".stripMargin
    s"""WITH ${lshSqlPrefix(LshTables, LshPlanes)},
       |x_rank AS (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |           ${r6("list_cosine_similarity(q.v, c.v)")} AS cos
       |    FROM e q JOIN e c ON c.vec_id != q.vec_id
       |    WHERE q.vec_id < $NumQueries
       |  )
       |), exact AS (
       |  SELECT q_id, neighbor_id FROM x_rank WHERE rn <= $TopK
       |), exact_n AS (
       |  SELECT q_id, count(*) AS n_exact FROM exact GROUP BY q_id
       |), ideal AS (
       |  SELECT q_id, SUM(${dcgT("i")}) AS idcg
       |  FROM exact_n, LATERAL (SELECT unnest(generate_series(1, LEAST(n_exact, $TopK))) AS i)
       |  GROUP BY q_id
       |), l_rank AS (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT cand.q_id, cand.neighbor_id,
       |           ${r6("list_cosine_similarity(qe.v, ce.v)")} AS cos
       |    FROM (
       |      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
       |      FROM bck c JOIN bck q ON c.tbl = q.tbl AND c.bucket = q.bucket
       |      WHERE q.vec_id < $NumQueries AND c.vec_id != q.vec_id
       |    ) cand
       |    JOIN e qe ON cand.q_id = qe.vec_id
       |    JOIN e ce ON cand.neighbor_id = ce.vec_id
       |  )
       |), lsh AS (
       |  SELECT q_id, neighbor_id, rn FROM l_rank WHERE rn <= $TopK
       |), ${ivfSqlCtes(2)}, i_rank AS (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT p.q_id, a.vec_id AS neighbor_id,
       |           ${r6("list_cosine_similarity(p.qv, a.v)")} AS cos
       |    FROM assigned a JOIN probed p ON a.cell = p.cell
       |    WHERE a.vec_id != p.q_id
       |  )
       |), ivf AS (
       |  SELECT q_id, neighbor_id, rn FROM i_rank WHERE rn <= $TopK
       |),
       |$pqSqlChain,
       |pq AS (
       |  SELECT q_id, neighbor_id, rn FROM pq_rank WHERE rn <= $TopK
       |), met_l AS (
       |  ${metCte("lsh")}
       |), met_i AS (
       |  ${metCte("ivf")}
       |), met_p AS (
       |  ${metCte("pq")}
       |)
       |SELECT method, q_id, n_exact, n_hit,
       |       ${r6("COALESCE(1.0 / first_rel, 0.0)")} AS mrr,
       |       CASE WHEN idcg IS NULL OR idcg = 0 THEN NULL
       |            ELSE ${r6("CAST(COALESCE(dcg, 0) AS DOUBLE) / CAST(idcg AS DOUBLE)")}
       |       END AS ndcg
       |FROM (
       |  ${armSql("ann_ivf", "met_i")}
       |  UNION ALL
       |  ${armSql("ann_lsh", "met_l")}
       |  UNION ALL
       |  ${armSql("ann_pq", "met_p")}
       |)
       |ORDER BY method, q_id""".stripMargin
  }

  // ------------------------------------------------- product quantization

  /** The corpus split into PqM subvector streams: (sub, vec_id, v) with
    * v = dims [sub·PqDsub, (sub+1)·PqDsub). ONE corpus scan — the
    * subspace axis is an in-row transform+explode, not PqM reads.
    */
  private def pqSubspaces(spark: SparkSession, dir: String): DataFrame =
    fannedCorpus(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("fv"))
      .select(
        col("vec_id"),
        explode(expr(
          s"transform(sequence(0, ${PqM - 1}), " +
            s"s -> named_struct('sub', s, 'sv', slice(fv, s * $PqDsub + 1, $PqDsub)))")).as("p"))
      .select(col("p.sub").as("sub"), col("vec_id"), col("p.sv").as("v"))

  /** Min-d2 codeword assignment per (sub, vec_id); same tie contract as
    * kmeansAssign (smaller cent_id wins). cents rows: (sub, cent_id,
    * cvec). The codebooks are tiny (m·k·dsub doubles) so they ride as a
    * CONSTANT-FOLDED 3-D literal and the argmin is one in-row
    * expression — array_position of the array minimum, which is the
    * first (= lowest cent_id, cents sorted) minimal d2. ZERO shuffle:
    * the first cut joined a broadcast codebook frame and min-of-struct
    * grouped on (sub, vec_id), which exploded k× rows carrying the
    * subvector payload into a corpus-keyed hash agg — 7.6 GiB of spill
    * at the 100×-docs probe; this form encodes the same corpus with no
    * exchange at all.
    */
  private def pqAssign(
      spark: SparkSession, es: DataFrame,
      cents: Seq[(Int, Long, Seq[Double])],
      keep: Seq[String] = Nil): DataFrame = {
    val bySub: Seq[Seq[(Long, Seq[Double])]] =
      (0 until PqM).map(s => cents.filter(_._1 == s).sortBy(_._2).map(c => (c._2, c._3)))
    es.withColumn("pq_books", typedLit(bySub.map(_.map(_._2))))
      .withColumn("pq_cids", typedLit(bySub.map(_.map(_._1))))
      .withColumn("d2s", expr(
        "transform(element_at(pq_books, sub + 1), " +
          "c -> aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x))"))
      .withColumn("idx", expr("array_position(d2s, array_min(d2s))").cast("int"))
      .select(
        (Seq(
          col("sub"), col("vec_id"),
          expr("element_at(element_at(pq_cids, sub + 1), idx)").as("cell"),
          expr("element_at(d2s, idx)").as("d2"),
          col("v")) ++ keep.map(col)): _*)
  }

  /** JVM-lifetime memo of the PQ codebooks (PqM·PqK·PqDsub doubles),
    * keyed on the embeddings file stamp like trainCentroids.
    */
  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Int, Int, Int), Seq[(Int, Long, Seq[Double])]]()

  private def trainPq(spark: SparkSession, dir: String): Seq[(Int, Long, Seq[Double])] =
    pqCache.computeIfAbsent(
      (dir, graft.sources.DerivedCache.sourceStamp(s"$dir/embeddings.parquet"),
        PqM, PqK, PqIters),
      _ => trainPqImpl(spark, dir))

  /** Per-subspace Lloyd (PqK codewords, PqIters steps, seeds = the
    * first PqK vectors' subvectors, cent_id = seed vec_id). All PqM
    * codebooks train in the SAME jobs — the subspace axis rides the
    * (sub, cell, dim) group keys, so each iteration is one corpus-wide
    * assign plus one k·m·dsub-row driver collect, exactly the
    * trainCentroids dataflow with one extra key column.
    */
  private def trainPqImpl(
      spark: SparkSession, dir: String): Seq[(Int, Long, Seq[Double])] =
    trainPqOn(spark, pqSubspaces(spark, dir))

  /** The Lloyd loop of trainPqImpl over an arbitrary (sub, vec_id, v)
    * subspace frame — shared by the raw-vector books (ann_pq family)
    * and the residual books (ann_ivfpq). Seeds = the subvectors of
    * vec_id < PqK rows of the SAME frame, so the residual variant
    * seeds from residuals, exactly what its oracle unrolls.
    */
  private def trainPqOn(
      spark: SparkSession, es: DataFrame): Seq[(Int, Long, Seq[Double])] = {
    var cents: Seq[(Int, Long, Seq[Double])] = es
      .filter(col("vec_id") < PqK)
      .orderBy(col("sub"), col("vec_id"))
      .collect()
      // vec_id via Number: the tolerated int32 vec_id testdata drift
      // (TablesSchemaSpec) must not ClassCastException the seed read
      .map(r => (r.getInt(0), r.getAs[Number](1).longValue, r.getSeq[Double](2)))
      .toSeq
    for (_ <- 1 to PqIters) {
      val means = pqAssign(spark, es, cents)
        .select(col("sub"), col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("sub"), col("cell"), col("dim"))
        .agg((Det.fineSum(col("x")) / count(lit(1))).as("mean"))
        .collect()
      cents = means
        .groupBy(r => (r.getInt(0), r.getLong(1)))
        .map { case ((sub, cell), rows) =>
          (sub, cell, rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
        }
        .toSeq
        .sortBy(c => (c._1, c._2))
    }
    cents
  }

  /** Product-quantized ANN (ADC scan): each corpus vector is compressed
    * to PqM one-byte codes (PqK = 32 codewords/subspace trained by
    * per-subspace Lloyd), a query's distance table (PqM·PqK partial
    * d2s, one per (sub, codeword)) is broadcast, and the approximate
    * squared-L2 distance is the table-lookup sum over the code columns
    * — top-10 per query by that ADC distance.
    *
    * This is the memory-bound 100 TB serving shape: the scan touches
    * PqM bytes per vector instead of 4·dim (32× compression at dim 64),
    * codes never shuffle for the lookup (the Q·m·k-row LUT broadcasts;
    * PlanAssertionsSpec pins the exchange budget), and the per-(q, vec)
    * sum is m DECIMAL partials — exact and
    * order-invariant, which is what lets DuckDB replay the whole thing
    * hash-for-hash (ranking is on the exact decimal ADC, not a rounded
    * double). Accuracy vs the exact anchor is asserted in
    * SimilarityDedupSpec (recall@10 against brute-force L2).
    */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = trainPq(spark, dir)
    val codes = pqAssign(spark, pqSubspaces(spark, dir), cents)
      .select(col("sub"), col("vec_id"), col("cell").as("code"))
    pqAdcRank(spark, dir, codes, broadcast(cents.toDF("bsub", "cent_id", "cent_vec")))
  }

  /** The shared PQ serve path (the ADC analog of ivfProbeRank): build
    * the query LUT against the broadcast codebooks `books(bsub,
    * cent_id, cent_vec)`, look each (sub, code) row of `codes` up via a
    * broadcast join, sum the PqM partials as exact DECIMAL, rank top-k
    * per query. Both ann_pq and ann_pq_stored rank through THIS code —
    * their byte-identical-results contract (shared oracle) must never
    * depend on two hand-synced copies.
    */
  private def pqAdcRank(
      spark: SparkSession, dir: String,
      codes: DataFrame, books: DataFrame): DataFrame = {
    val lut = pqSubspaces(spark, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("sub").as("lsub"), col("vec_id").as("q_id"), col("v"))
      .join(books, col("lsub") === col("bsub"))
      .select(
        col("q_id"), col("lsub"), col("cent_id").cast("long").as("lcode"),
        expr(KmeansDistExpr).as("pd2"))
    val scan = codes
      .join(
        broadcast(lut),
        col("sub") === col("lsub") && col("code").cast("long") === col("lcode"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pd2").cast(Det.Fine)).as("adc_dec"))
    val w = Window.partitionBy(col("q_id")).orderBy(asc("adc_dec"), asc("vec_id"))
    scan
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        Det.detRound(col("adc_dec").cast("double"), 6).as("adc"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** PQ oracle CTE chain (assumes `e(vec_id, v: DOUBLE[])` is already
    * defined): subspace slices, the per-subspace Lloyd chains unrolled
    * (the kmeansChainSql shape with `sub` riding every key), codes ⋈
    * LUT summed as DECIMAL, ranked per query. Terminal CTE `pq_rank`
    * has (q_id, neighbor_id, adc_dec, rn). Shared by annPqSql and the
    * PQ branch of annRecallSql; all CTE names are pq_-prefixed so the
    * chain composes with the LSH/IVF chains without collision.
    */
  private def pqSqlChain: String = {
    def d2(v: String, c: String) = kmeansD2Sql(v, c)
    def assignCte(name: String, centsCte: String, keep: String) =
      s"""$name AS (
         |  SELECT $keep FROM (
         |    SELECT e.sub, e.vec_id, e.sv, c.cent_id AS cell, ${d2("e.sv", "c.cvec")} AS d2,
         |           row_number() OVER (PARTITION BY e.sub, e.vec_id
         |             ORDER BY ${d2("e.sv", "c.cvec")} ASC, c.cent_id ASC) AS rk
         |    FROM pq_es e JOIN $centsCte c ON c.sub = e.sub
         |  ) WHERE rk = 1
         |)""".stripMargin
    def centsCte(name: String, assignCteName: String) =
      s"""$name AS (
         |  SELECT sub, cell AS cent_id, list(mean ORDER BY dim) AS cvec FROM (
         |    SELECT sub, cell, dim, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mean
         |    FROM (SELECT sub, cell, unnest(generate_series(1, len(sv))) AS dim, unnest(sv) AS x
         |          FROM $assignCteName)
         |    GROUP BY sub, cell, dim
         |  ) GROUP BY sub, cell
         |)""".stripMargin
    val chain = (1 to PqIters)
      .flatMap(i => Seq(
        assignCte(s"pq_a$i", s"pq_c${i - 1}", "sub, vec_id, sv, cell"),
        centsCte(s"pq_c$i", s"pq_a$i")))
      .mkString(",\n")
    s"""pq_es AS (
       |  SELECT t.s AS sub, vec_id,
       |         list_slice(v, t.s * $PqDsub + 1, t.s * $PqDsub + $PqDsub) AS sv
       |  FROM e, unnest(generate_series(0, ${PqM - 1})) AS t(s)
       |), pq_c0 AS (
       |  SELECT sub, vec_id AS cent_id, sv AS cvec FROM pq_es WHERE vec_id < $PqK
       |),
       |$chain,
       |${assignCte("pq_codes", s"pq_c$PqIters", "sub, vec_id, cell AS code")},
       |pq_lut AS (
       |  SELECT q.vec_id AS q_id, q.sub, c.cent_id AS code, ${d2("q.sv", "c.cvec")} AS pd2
       |  FROM pq_es q JOIN pq_c$PqIters c ON c.sub = q.sub
       |  WHERE q.vec_id < $NumQueries
       |), pq_scan AS (
       |  SELECT l.q_id, k.vec_id, SUM(CAST(pd2 AS DECIMAL(30,10))) AS adc_dec
       |  FROM pq_codes k JOIN pq_lut l ON l.sub = k.sub AND l.code = k.code
       |  WHERE k.vec_id != l.q_id
       |  GROUP BY l.q_id, k.vec_id
       |), pq_rank AS (
       |  SELECT q_id, vec_id AS neighbor_id, adc_dec,
       |         row_number() OVER (PARTITION BY q_id ORDER BY adc_dec ASC, vec_id ASC) AS rn
       |  FROM pq_scan
       |)""".stripMargin
  }

  /** DuckDB twin of annPq — the shared pqSqlChain plus the top-k
    * projection; the identical exactness contract (exact decimal ADC).
    */
  private val annPqSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |),
       |$pqSqlChain
       |SELECT q_id, neighbor_id,
       |       ${Det.roundSql("CAST(adc_dec AS DOUBLE)", 6)} AS adc,
       |       CAST(rn AS BIGINT) AS rn
       |FROM pq_rank WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin

  /** Stored-index PQ — ann_pq's build/serve split. The build persists
    * the PqM codebooks plus the compressed corpus in its REAL index
    * layout: one row per vector, codes packed as a single
    * array<int>[PqM] column (8 codes ≈ 8 bytes vs 256 bytes of floats —
    * the whole point of PQ is that THIS is the only corpus-sized thing
    * a serving scan ever reads). Serve = read codes, in-row posexplode
    * to (sub, code), join the broadcast query LUT, same exact-DECIMAL
    * ADC rank as annPq — identical results by construction, so it
    * shares annPqSql. Build once ∝ corpus; serve reads PqM bytes/vector
    * and never touches `embeddings`.
    */
  def annPqStored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val rows = Tables.cachedCount(spark, dir, "embeddings")
    val idx = graft.sources.DerivedCache.dir(
      dir, "ann-pq", s"rows=$rows;m=$PqM;k=$PqK;iters=$PqIters") { out =>
      val cents = trainPq(spark, dir)
      writeStored(cents.toDF("sub", "cent_id", "cvec"), out, "books", Nil)
      val packed = pqAssign(spark, pqSubspaces(spark, dir), cents)
        .groupBy(col("vec_id"))
        .agg(expr("transform(array_sort(collect_list(struct(sub, cell))), p -> CAST(p.cell AS INT))")
          .as("codes"))
      writeStored(packed, out, "codes", Nil)
    }
    val books = broadcast(spark.read
      .schema(readStoredSchema(idx, "books", StructType(Seq(
        StructField("sub", IntegerType),
        StructField("cent_id", LongType),
        StructField("cvec", ArrayType(DoubleType))))))
      .parquet(s"$idx/books"))
    val codes = spark.read
      .schema(readStoredSchema(idx, "codes", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("codes", ArrayType(IntegerType))))))
      .parquet(s"$idx/codes")
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
    pqAdcRank(spark, dir, codes,
      books.select(
        col("sub").as("bsub"), col("cent_id"), col("cvec").as("cent_vec")))
  }

  /** Incremental IVF index maintenance — the ANN sibling of
    * dedup_incremental: the quantizer is trained ONCE on the BASE
    * partition (vec_id % 10 < 8, the corpus that existed when the
    * index was built) and persisted with the base cell assignments via
    * DerivedCache; the delta (% 10 >= 8 — a later ingest batch) is
    * assigned to the STORED centroids in one broadcast pass — NO
    * retrain, no base rescan — and the serve probes cells over
    * base ∪ delta. This is how a production vector store actually
    * grows: per-batch cost ∝ delta, retrain deferred until drift
    * warrants it (which ann_nprobe_curve / ann_recall price). Oracle:
    * the base-restricted Lloyd chain + both assignments unrolled in
    * SQL.
    */
  def annIvfIncremental(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val k = 8; val iters = 3
    val rows = Tables.cachedCount(spark, dir, "embeddings")
    val idx = graft.sources.DerivedCache.dir(
      dir, "ann-ivf-base", s"rows=$rows;k=$k;iters=$iters") { out =>
      import spark.implicits._
      val baseE = corpus(spark, dir)
        .filter(col("vec_id") % 10 < 8)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val cents = trainCentroidsOf(spark, baseE, k, iters)
      writeStored(cents.toDF("cent_id", "cent_vec"), out, "cents", Nil)
      writeStored(
        kmeansAssign(spark, baseE, cents)
          .join(corpus(spark, dir), "vec_id")
          .select(col("vec_id"), col("embedding"), col("cell")),
        out, "cells", Seq("cell"))
      ()
    }
    import org.apache.spark.sql.types._
    val centsDf = broadcast(spark.read
      .schema(readStoredSchema(idx, "cents", StructType(Seq(
        StructField("cent_id", IntegerType),
        StructField("cent_vec", ArrayType(DoubleType))))))
      .parquet(s"$idx/cents"))
    val baseAssigned = spark.read
      .schema(readStoredSchema(idx, "cells", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("cell", IntegerType)))))
      .parquet(s"$idx/cells")
    // the incremental step: delta vectors against the STORED quantizer
    // (k·dim doubles — a bounded collect, the model-registry read)
    val cents = centsDf
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .toSeq
      .sortBy(_._1)
    val deltaAssigned = kmeansAssign(
      spark,
      corpus(spark, dir)
        .filter(col("vec_id") % 10 >= 8)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")),
      cents)
      .join(corpus(spark, dir), "vec_id")
      .select(col("vec_id"), col("embedding"), col("cell"))
    ivfProbeRank(spark, dir, baseAssigned.unionByName(deltaAssigned), centsDf)
  }

  private val annIvfIncrementalSql = {
    val iters = 3
    def r6(e: String) = Det.roundSql(e, 6)
    s"""WITH ${kmeansChainSql(8, iters, src = "eb", srcFilter = "vec_id % 10 < 8")},
       |ed AS (
       |  SELECT vec_id, v FROM e WHERE vec_id % 10 >= 8
       |),
       |${kmeansAssignCte("assigned_base", s"c$iters", "eb")},
       |${kmeansAssignCte("assigned_delta", s"c$iters", "ed")},
       |assigned AS (
       |  SELECT vec_id, v, cell FROM assigned_base
       |  UNION ALL
       |  SELECT vec_id, v, cell FROM assigned_delta
       |),
       |probed AS (
       |  SELECT q_id, qv, cell FROM (
       |    SELECT q.vec_id AS q_id, q.v AS qv, c.cent_id AS cell,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${kmeansD2Sql("q.v", "c.cvec")} ASC, c.cent_id ASC) AS rk
       |    FROM e q CROSS JOIN c$iters c WHERE q.vec_id < $NumQueries
       |  ) WHERE rk <= 2
       |), scored AS (
       |  SELECT p.q_id, a.vec_id AS neighbor_id,
       |         ${r6("list_cosine_similarity(p.qv, a.v)")} AS cos
       |  FROM assigned a JOIN probed p ON a.cell = p.cell
       |  WHERE a.vec_id != p.q_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM scored
       |)
       |SELECT q_id, neighbor_id, cos, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin
  }

  /** IVF nprobe tuning curve — the ANN-side sibling of lsh_band_sweep
    * and minhash_k_curve: for nprobe ∈ {1,2,4} probed cells (same
    * fixed 16-cell quantizer and tie-break conventions as ann_ivf, so
    * the oracle stays tractable), the candidate volume each setting
    * pays and the recall it buys against the brute-force anchor. This
    * is the serving-cost-vs-recall trade every IVF deployment tunes
    * FIRST: candidates scale read+compute per query linearly in probed
    * cell mass; recall is what the probes miss. Cell assignment and
    * the probe ranking are computed ONCE and shared by all three arms
    * (lineage cuts); per-arm work is one candidate join + top-k + one
    * count — queries and centroids broadcast, candidates never leave
    * their cell partition, every count is a 1-row aggregate.
    */
  def annNprobeCurve(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val cents = ivfCents(spark, dir)
    // the fixed-quantizer cell table as a STORED index (the ann-ivf
    // pattern): the curve prices probe widths against a BUILT index,
    // so the corpus assignment pass is a build-once artifact, not
    // per-run work
    val assigned = {
      val out = graft.sources.DerivedCache.dir(
        dir, "ann-ivf-fixed", "cells=16") { o =>
        writeStored(ivfAssigned(spark, dir, ivfCents(spark, dir)), o, "cells", Nil)
      }
      import org.apache.spark.sql.types._
      spark.read
        .schema(readStoredSchema(out, "cells", StructType(Seq(
          StructField("vec_id", LongType),
          StructField("cell", LongType), // cell = winning cent_id = a vec_id
          StructField("embedding", ArrayType(FloatType))))))
        .parquet(s"$out/cells")
    }
    val probeRk = ivfProbeRanks(spark, dir, cents)
      .filter(col("rk") <= 4) // the widest arm
      .cutLineage()

    // the STORED ground-truth anchor (build-once parquet) replaces the
    // former per-run brute-force pass + checkpoint
    val exact = annExactStored(spark, dir)
      .select(col("q_id"), col("neighbor_id"))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val nQ     = queries(spark, dir).agg(count(lit(1)).as("n_queries"))

    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    val arms = Seq(1, 2, 4).map { np =>
      val probed = probeRk
        .filter(col("rk") <= np)
        .select(col("q_id"), col("q_vec"), col("cell"))
      // a vector lives in exactly ONE cell, so the probed-cells join
      // cannot duplicate a (query, neighbor) candidate
      val cand = assigned
        .join(broadcast(probed), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(
          col("q_id"),
          col("vec_id").as("neighbor_id"),
          Det.detRound(expr("graft_cosine(q_vec, embedding)"), 6).as("cos"))
        .cutLineage(eager = false) // candidate count + top-k share it
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val nHit = cand
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TopK)
        .join(exact, Seq("q_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      nCand
        .crossJoin(nHit)
        .crossJoin(nExact)
        .crossJoin(nQ)
        .select(
          lit(np.toLong).as("nprobe"),
          col("n_queries"),
          col("n_candidates"),
          when(col("n_queries") === 0, lit(0.0))
            .otherwise(Det.detRound(
              col("n_candidates").cast("double") / col("n_queries"), 6))
            .as("avg_candidates"),
          col("n_hit"),
          col("n_exact"),
          when(col("n_exact") === 0, lit(0.0))
            .otherwise(Det.detRound(
              col("n_hit").cast("double") / col("n_exact"), 6))
            .as("recall"))
    }
    arms.reduce(_ unionAll _).orderBy(col("nprobe"))
  }

  private val annNprobeCurveSql = {
    def r6(e: String) = Det.roundSql(e, 6)
    def arm(np: Int) =
      s"""  SELECT CAST($np AS BIGINT) AS nprobe,
         |         (SELECT count(*) FROM qs) AS n_queries,
         |         (SELECT count(*) FROM cand_$np) AS n_candidates,
         |         CASE WHEN (SELECT count(*) FROM qs) = 0 THEN CAST(0 AS DOUBLE)
         |              ELSE ${r6(
            s"CAST((SELECT count(*) FROM cand_$np) AS DOUBLE) / (SELECT count(*) FROM qs)")} END AS avg_candidates,
         |         (SELECT count(*) FROM topk_$np t JOIN exact x
         |            ON t.q_id = x.q_id AND t.neighbor_id = x.neighbor_id) AS n_hit,
         |         (SELECT count(*) FROM exact) AS n_exact,
         |         CASE WHEN (SELECT count(*) FROM exact) = 0 THEN CAST(0 AS DOUBLE)
         |              ELSE ${r6(
            s"""CAST((SELECT count(*) FROM topk_$np t JOIN exact x
               |            ON t.q_id = x.q_id AND t.neighbor_id = x.neighbor_id) AS DOUBLE)
               |            / (SELECT count(*) FROM exact)""".stripMargin)} END AS recall""".stripMargin
    def candCtes(np: Int) =
      s"""cand_$np AS (
         |  SELECT p.q_id, a.vec_id AS neighbor_id,
         |         ${r6("list_cosine_similarity(p.qv, a.v)")} AS cos
         |  FROM assigned a JOIN probed p ON a.cell = p.cell AND p.rk <= $np
         |  WHERE a.vec_id != p.q_id
         |), topk_$np AS (
         |  SELECT q_id, neighbor_id FROM (
         |    SELECT q_id, neighbor_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
         |    FROM cand_$np
         |  ) WHERE rn <= $TopK
         |)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), qs AS (
       |  SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries
       |), ${ivfSqlCtes(4)}, x_rank AS (
       |  SELECT q_id, neighbor_id, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rn
       |  FROM (
       |    SELECT q.q_id, c.vec_id AS neighbor_id,
       |           ${r6("list_cosine_similarity(q.qv, c.v)")} AS cos
       |    FROM e c JOIN qs q ON c.vec_id != q.q_id
       |  )
       |), exact AS (
       |  SELECT q_id, neighbor_id FROM x_rank WHERE rn <= $TopK
       |), ${candCtes(1)}, ${candCtes(2)}, ${candCtes(4)}
       |${arm(1)}
       |UNION ALL
       |${arm(2)}
       |UNION ALL
       |${arm(4)}
       |ORDER BY nprobe""".stripMargin
  }

  /** kNN label-propagation evaluation — the semi-supervised bootstrap
    * a quality/topic classifier starts from (label a seed set, predict
    * the rest from embedding neighbors), graded on a deterministic
    * hold-out: vectors with vec_id % 10 = 0 have their labels hidden,
    * each is predicted by majority vote of its ≤3 nearest LABELED
    * neighbors (labeled = the other 90%, NULL labels excluded) among
    * the LSH-bucketed candidates, and per-true-label accuracy is
    * reported. Every stage is bounded: candidates come from the capped
    * LSH buckets (never all-pairs), per-eval neighbors cap at 3, votes
    * at 3 rows per eval vector. Ties break deterministically — by
    * (cos, nid) for neighbors, (count, label) for votes — mirrored in
    * the oracle. Evaluation vectors with zero labeled candidates drop
    * out (uncovered — the LSH recall story belongs to ann_recall).
    */
  def embeddingKnnEval(spark: SparkSession, dir: String): DataFrame = {
    val pairs = lshScoredPairs(spark, dir)
    val lbl   = corpus(spark, dir).select(col("vec_id"), col("label"))
    val sym = pairs
      .select(col("vec_a").as("eid"), col("vec_b").as("nid"), col("cos"))
      .unionAll(pairs.select(col("vec_b").as("eid"), col("vec_a").as("nid"), col("cos")))
    val cand = sym
      .filter(col("eid") % 10 === 0 && col("nid") % 10 =!= 0)
      .join(lbl.select(col("vec_id").as("nid"), col("label").as("nlbl")), "nid")
      .filter(col("nlbl").isNotNull)
    val wK = Window.partitionBy(col("eid")).orderBy(desc("cos"), asc("nid"))
    val votes = cand
      .withColumn("rk", row_number().over(wK))
      .filter(col("rk") <= 3)
      .groupBy(col("eid"), col("nlbl"))
      .agg(count(lit(1)).as("cnt"))
    val wV = Window.partitionBy(col("eid")).orderBy(desc("cnt"), asc("nlbl"))
    val pred = votes
      .withColumn("rv", row_number().over(wV))
      .filter(col("rv") === 1)
      .select(col("eid"), col("nlbl").as("pred"))
    pred
      .join(lbl.select(col("vec_id").as("eid"), col("label").as("true_label")), "eid")
      .groupBy(col("true_label"))
      .agg(
        count(lit(1)).as("n_eval"),
        sum(when(col("pred") === col("true_label"), 1L).otherwise(0L)).as("n_correct"))
      .select(
        col("true_label"), col("n_eval"), col("n_correct"),
        Det.detRound(col("n_correct").cast("double") / col("n_eval"), 6).as("accuracy"))
      .orderBy(asc_nulls_last("true_label"))
  }

  private val embeddingKnnEvalSql =
    s"""WITH $lshPairsSqlChain,
       |sym AS (
       |  SELECT vec_a AS eid, vec_b AS nid, cos FROM lscored
       |  UNION ALL
       |  SELECT vec_b AS eid, vec_a AS nid, cos FROM lscored
       |), cand AS (
       |  SELECT s.eid, s.nid, s.cos, en.label AS nlbl
       |  FROM sym s JOIN embeddings en ON s.nid = en.vec_id
       |  WHERE s.eid % 10 = 0 AND s.nid % 10 != 0 AND en.label IS NOT NULL
       |), votes AS (
       |  SELECT eid, nlbl, count(*) AS cnt FROM (
       |    SELECT *, row_number() OVER (PARTITION BY eid ORDER BY cos DESC, nid) AS rk
       |    FROM cand
       |  ) WHERE rk <= 3
       |  GROUP BY eid, nlbl
       |), pred AS (
       |  SELECT eid, nlbl AS pred FROM (
       |    SELECT *, row_number() OVER (PARTITION BY eid ORDER BY cnt DESC, nlbl) AS rv
       |    FROM votes
       |  ) WHERE rv = 1
       |)
       |SELECT ev.label AS true_label,
       |       count(*) AS n_eval,
       |       CAST(SUM(CASE WHEN p.pred = ev.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |       ${Det.roundSql(
          "CAST(SUM(CASE WHEN p.pred = ev.label THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
          6)} AS accuracy
       |FROM pred p JOIN embeddings ev ON p.eid = ev.vec_id
       |GROUP BY ev.label
       |ORDER BY true_label""".stripMargin

  /** Label-noise report — the confident-learning-style audit over the
    * labeled set itself (embedding_knn_eval grades a classifier; this
    * flags the TRAINING LABELS): a labeled vector whose ≤3-nearest
    * labeled neighbors (self excluded) majority-vote a DIFFERENT label
    * is a mislabel candidate — the rows a curation pass re-annotates
    * or drops before training a quality/topic classifier. Same bounded
    * LSH candidate machinery and tie-breaks as the eval twin; vectors
    * with no labeled candidates drop out (uncovered). Output:
    * per-label flag rates, the view that says WHICH classes are
    * noisy.
    */
  def labelNoiseReport(spark: SparkSession, dir: String): DataFrame = {
    val pairs = lshScoredPairs(spark, dir)
    val lbl   = corpus(spark, dir).select(col("vec_id"), col("label"))
    val sym = pairs
      .select(col("vec_a").as("eid"), col("vec_b").as("nid"), col("cos"))
      .unionAll(pairs.select(col("vec_b").as("eid"), col("vec_a").as("nid"), col("cos")))
    val cand = sym
      .join(lbl.select(col("vec_id").as("eid"), col("label").as("self_lbl")), "eid")
      .join(lbl.select(col("vec_id").as("nid"), col("label").as("nlbl")), "nid")
      .filter(col("self_lbl").isNotNull && col("nlbl").isNotNull)
    val wK = Window.partitionBy(col("eid")).orderBy(desc("cos"), asc("nid"))
    val votes = cand
      .withColumn("rk", row_number().over(wK))
      .filter(col("rk") <= 3)
      .groupBy(col("eid"), col("self_lbl"), col("nlbl"))
      .agg(count(lit(1)).as("cnt"))
    val wV = Window.partitionBy(col("eid")).orderBy(desc("cnt"), asc("nlbl"))
    votes
      .withColumn("rv", row_number().over(wV))
      .filter(col("rv") === 1)
      .groupBy(col("self_lbl").as("label"))
      .agg(
        count(lit(1)).as("n_checked"),
        sum(when(col("nlbl") =!= col("self_lbl"), 1L).otherwise(0L)).as("n_flagged"))
      .select(
        col("label"), col("n_checked"), col("n_flagged"),
        Det.detRound(col("n_flagged").cast("double") / col("n_checked"), 6).as("flag_rate"))
      .orderBy(asc_nulls_last("label"))
  }

  private val labelNoiseReportSql =
    s"""WITH $lshPairsSqlChain,
       |sym AS (
       |  SELECT vec_a AS eid, vec_b AS nid, cos FROM lscored
       |  UNION ALL
       |  SELECT vec_b AS eid, vec_a AS nid, cos FROM lscored
       |), cand AS (
       |  SELECT s.eid, s.nid, s.cos, es.label AS self_lbl, en.label AS nlbl
       |  FROM sym s
       |  JOIN embeddings es ON s.eid = es.vec_id
       |  JOIN embeddings en ON s.nid = en.vec_id
       |  WHERE es.label IS NOT NULL AND en.label IS NOT NULL
       |), votes AS (
       |  SELECT eid, self_lbl, nlbl, count(*) AS cnt FROM (
       |    SELECT *, row_number() OVER (PARTITION BY eid ORDER BY cos DESC, nid) AS rk
       |    FROM cand
       |  ) WHERE rk <= 3
       |  GROUP BY eid, self_lbl, nlbl
       |), verdicts AS (
       |  SELECT eid, self_lbl, nlbl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY eid ORDER BY cnt DESC, nlbl) AS rv
       |    FROM votes
       |  ) WHERE rv = 1
       |)
       |SELECT self_lbl AS label,
       |       count(*) AS n_checked,
       |       CAST(SUM(CASE WHEN nlbl != self_lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |       ${Det.roundSql(
          "CAST(SUM(CASE WHEN nlbl != self_lbl THEN 1 ELSE 0 END) AS DOUBLE) / count(*)",
          6)} AS flag_rate
       |FROM verdicts
       |GROUP BY self_lbl
       |ORDER BY label""".stripMargin

  /** Filtered vector search — exact top-k restricted to candidates
    * sharing the query's label (the metadata-filtered serving mode
    * every production vector store exposes: "nearest neighbors WHERE
    * tenant/lang/category = X"). Pre-filtering at the scan beats
    * post-filtering a top-k that may contain zero matching rows. Spark
    * shape: the query batch broadcasts with its labels, the label
    * equi-key rides the broadcast hash join so non-matching corpus
    * rows never reach the cosine kernel, and the per-query rank lowers
    * to TopKPerKey (bounded heaps, no global sort).
    */
  def annFiltered(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val q = corpus(spark, dir)
      .filter(col("vec_id") < NumQueries)
      .select(
        col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("label").as("q_label"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("cos"), asc("neighbor_id"))
    corpus(spark, dir)
      .join(broadcast(q), col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"),
        col("vec_id").as("neighbor_id"),
        Det.detRound(expr("graft_cosine(q_vec, embedding)"), 6).as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .orderBy(col("q_id"), col("rn"))
  }

  /** DuckDB twin of annFiltered: the brute-force chain with the label
    * predicate in the join — same rounding, same tie-breaks.
    */
  private val annFilteredSql =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
       |), sims AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |         ${Det.roundSql("list_cosine_similarity(q.v, c.v)", 6)} AS cos
       |  FROM e q JOIN e c ON c.vec_id != q.vec_id AND c.label = q.label
       |  WHERE q.vec_id < $NumQueries
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM sims
       |)
       |SELECT q_id, neighbor_id, cos, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin

  // ------------------------------------------------------------ IVF-PQ

  /** JVM-lifetime memo of the RESIDUAL codebooks (trained on v − c[cell],
    * not raw vectors) — keyed like pqCache plus the coarse-quantizer
    * params, since retraining the coarse cells changes every residual.
    */
  private val ivfPqCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Seq[(Int, Long, Seq[Double])]]()

  /** Residual codebooks, PERSISTED like trainCentroids' model file
    * (DerivedCache + raw long-bit doubles, bit-exact round trip) so the
    * residual Lloyd run is paid once EVER per corpus stamp — every
    * IVFADC consumer (ann_ivfpq, its stored index, the health audit,
    * the nprobe curve) in any later JVM reads the m·k·dsub model back
    * instead of re-training. `resSub` is by-name: a model-cache hit
    * skips building the residual frame entirely.
    */
  private def trainIvfPqBooks(
      spark: SparkSession, dir: String,
      resSub: => DataFrame): Seq[(Int, Long, Seq[Double])] =
    ivfPqCache.computeIfAbsent(
      (dir, graft.sources.DerivedCache.sourceStamp(s"$dir/embeddings.parquet")),
      _ => {
        def train() = trainPqOn(spark, resSub.select(col("sub"), col("vec_id"), col("v")))
        val model = graft.sources.DerivedCache.dir(
          dir, "ivfpq-books",
          s"m=$PqM;k=$PqK;iters=$PqIters;coarse=${IvfPqCoarseK}x$IvfPqCoarseIters") { out =>
          val lines = train().map { case (s, c, v) =>
            s"$s\t$c\t${v.map(java.lang.Double.doubleToLongBits).mkString(",")}"
          }
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$out/books.tsv"),
            lines.mkString("\n").getBytes("UTF-8"))
          ()
        }
        try {
          val txt = new String(
            java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(s"$model/books.tsv")), "UTF-8")
          txt.split("\n").filter(_.nonEmpty).toSeq.map { line =>
            val Array(s, c, vs) = line.split("\t", 3)
            (s.toInt, c.toLong,
              if (vs.isEmpty) Seq.empty[Double]
              else vs.split(",").toSeq.map(b =>
                java.lang.Double.longBitsToDouble(b.toLong)))
          }
        } catch {
          // unreadable/torn model file: fresh train (identical result)
          case _: Exception => train()
        }
      })

  /** The (sub, vec_id, v, ivf_cell) residual-subspace frame behind
    * ann_ivfpq: assign each corpus vector to its trained coarse cell,
    * subtract the cell centroid, split the residual into PqM subvector
    * streams. One corpus scan — cell assignment, residual and subspace
    * split are all in-row against the broadcast k·dim centroid list.
    */
  private def ivfPqResidSubspaces(
      spark: SparkSession, dir: String,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    // In-row argmin against the constant-folded k·dim centroid literal
    // (the pqAssign trick): cell assignment + residual never shuffle —
    // kmeansAssign's groupBy(vec_id) would move every vector once.
    // array_position of the minimum = FIRST minimal d2 = lowest cent_id
    // (sorted), the same tie contract as kmeansAssign and the oracle.
    val sorted = cents.sortBy(_._1)
    fannedCorpus(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("cvecs", typedLit(sorted.map(_._2)))
      .withColumn("cids", typedLit(sorted.map(_._1)))
      .withColumn("d2s", expr(
        "transform(cvecs, c -> aggregate(zip_with(v, c, (a, b) -> (a - b) * (a - b)), 0D, (acc, x) -> acc + x))"))
      .withColumn("idx", expr("array_position(d2s, array_min(d2s))").cast("int"))
      .select(
        col("vec_id"),
        expr("element_at(cids, idx)").as("ivf_cell"),
        expr("zip_with(v, element_at(cvecs, idx), (a, b) -> a - b)").as("rv"))
      .select(
        col("vec_id"), col("ivf_cell"),
        explode(expr(
          s"transform(sequence(0, ${PqM - 1}), " +
            s"s -> named_struct('sub', s, 'sv', slice(rv, s * $PqDsub + 1, $PqDsub)))")).as("p"))
      .select(col("p.sub").as("sub"), col("vec_id"), col("p.sv").as("v"), col("ivf_cell"))
  }

  /** IVF-PQ (the Faiss IVFADC composition — Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 §IV): the
    * trained coarse quantizer prunes the corpus to each query's 2
    * nearest cells, and within those cells distance is the ADC sum over
    * PQ codes of the RESIDUAL (v − c[cell]) — residual quantization
    * spends the codebook's resolution on the within-cell geometry
    * instead of re-encoding the cell offset, which is why every
    * production vector store serves this composition rather than
    * ann_ivf (exact distances, full vectors touched) or ann_pq (ADC,
    * but the whole corpus scanned). Spark shape: centroids and residual
    * codebooks are driver-trained tiny models (broadcast); the corpus
    * is encoded in one scan with ZERO exchange (pqAssign's constant-
    * folded codebook literal, ivf_cell rides the rows); the serve scan
    * joins the Q·2·m·k-row LUT BROADCAST on (cell, sub, code) so only
    * probed-cell code rows survive, then sums exact-DECIMAL partials
    * and ranks per query. At 100 TB the serving cost is PqM bytes per
    * vector in 2-of-8 cells per query — the pruning of IVF stacked on
    * the compression of PQ. Oracle: coarse Lloyd chain + residual
    * Lloyd chain + probe + LUT + ADC rank, all unrolled.
    */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val k = IvfPqCoarseK; val iters = IvfPqCoarseIters
    val cents = trainCentroids(spark, dir, k, iters)
    val resSub = ivfPqResidSubspaces(spark, dir, cents)
    val books = trainIvfPqBooks(spark, dir, resSub)
    val codes = pqAssign(spark, resSub, books, keep = Seq("ivf_cell"))
      .select(col("sub"), col("vec_id"), col("ivf_cell"), col("cell").cast("long").as("code"))
    ivfPqServe(spark, dir, codes, books, cents)
  }

  /** The shared IVFADC serve path (the IVF-PQ analog of pqAdcRank):
    * probe 2 coarse cells per query, build the per-(query, cell)
    * residual LUT against the broadcast codebooks, join it BROADCAST
    * onto the code stream on (cell, sub, code) — only probed-cell code
    * rows survive — sum exact-DECIMAL partials, rank top-k. Both
    * ann_ivfpq and ann_ivfpq_stored rank through THIS code, which is
    * what lets the stored variant share the oracle byte-for-byte.
    */
  private def ivfPqServe(
      spark: SparkSession, dir: String, codes: DataFrame,
      books: Seq[(Int, Long, Seq[Double])],
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    // probe: 2 nearest coarse cells per query, query residual per cell
    val wProbe = Window.partitionBy(col("q_id")).orderBy(asc("d2"), asc("cent_id"))
    val probed = queries(spark, dir)
      .select(col("q_id"), expr("transform(q_vec, x -> CAST(x AS DOUBLE))").as("v"))
      .crossJoin(broadcast(cents.toDF("cent_id", "cent_vec")))
      .withColumn("d2", expr(KmeansDistExpr))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= 2)
      .select(
        col("q_id"), col("cent_id").as("lcell"),
        expr("zip_with(v, cent_vec, (a, b) -> a - b)").as("qr"))
    // LUT: per (query, probed cell, sub, codeword) partial d2 of the
    // query residual against the residual codebooks — Q·2·m·k rows
    val lut = probed
      .select(
        col("q_id"), col("lcell"),
        explode(expr(
          s"transform(sequence(0, ${PqM - 1}), " +
            s"s -> named_struct('sub', s, 'sv', slice(qr, s * $PqDsub + 1, $PqDsub)))")).as("p"))
      .select(col("q_id"), col("lcell"), col("p.sub").as("lsub"), col("p.sv").as("v"))
      .join(broadcast(books.toDF("bsub", "cent_id", "cent_vec")), col("lsub") === col("bsub"))
      .select(
        col("q_id"), col("lcell"), col("lsub"),
        col("cent_id").cast("long").as("lcode"), expr(KmeansDistExpr).as("pd2"))

    val scan = codes
      .join(
        broadcast(lut),
        col("ivf_cell") === col("lcell") && col("sub") === col("lsub") &&
          col("code") === col("lcode"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pd2").cast(Det.Fine)).as("adc_dec"))
    val w = Window.partitionBy(col("q_id")).orderBy(asc("adc_dec"), asc("vec_id"))
    scan
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        Det.detRound(col("adc_dec").cast("double"), 6).as("adc"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Stored-index IVF-PQ — the build/serve split of the full IVFADC
    * index, persisted in its REAL layout: the residual codebooks
    * (m·k·dsub doubles) plus one row per vector of (vec_id, packed
    * m-byte code array), PARTITIONED BY COARSE CELL — the on-disk twin
    * of Faiss's per-cell posting lists. Built ONCE per corpus stamp via
    * DerivedCache; the serve path reads codes + the two tiny models
    * back and ranks through the SAME ivfPqServe as the in-plan build,
    * so results are identical by construction (shared oracle). The
    * cell-partitioned directory is the point at 100 TB: the broadcast
    * LUT join's cell key lets dynamic partition pruning skip the 6-of-8
    * unprobed cell directories, so a query batch touches PqM bytes per
    * vector in ONLY the cells it probes.
    */
  def annIvfPqStored(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val k = IvfPqCoarseK; val iters = IvfPqCoarseIters
    val rows = Tables.cachedCount(spark, dir, "embeddings")
    val idx = graft.sources.DerivedCache.dir(
      dir, "ann-ivfpq",
      s"rows=$rows;k=$k;iters=$iters;m=$PqM;pk=$PqK;pi=$PqIters") { out =>
      import spark.implicits._
      val cents = trainCentroids(spark, dir, k, iters)
      val resSub = ivfPqResidSubspaces(spark, dir, cents)
      val books = trainIvfPqBooks(spark, dir, resSub)
      writeStored(books.toDF("sub", "cent_id", "cvec"), out, "books", Nil)
      val packed = pqAssign(spark, resSub, books, keep = Seq("ivf_cell"))
        .groupBy(col("vec_id"), col("ivf_cell"))
        .agg(expr("transform(array_sort(collect_list(struct(sub, cell))), p -> CAST(p.cell AS INT))")
          .as("codes"))
      writeStored(packed, out, "codes", Seq("ivf_cell"))
    }
    val books = spark.read
      .schema(readStoredSchema(idx, "books", StructType(Seq(
        StructField("sub", IntegerType),
        StructField("cent_id", LongType),
        StructField("cvec", ArrayType(DoubleType))))))
      .parquet(s"$idx/books")
      .collect()
      .map(r => (r.getInt(0), r.getAs[Number](1).longValue, r.getSeq[Double](2).toSeq))
      .toSeq
      .sortBy(b => (b._1, b._2))
    // the coarse quantizer is the persisted kmeans model — a k·dim read
    val cents = trainCentroids(spark, dir, k, iters)
    val codes = spark.read
      .schema(readStoredSchema(idx, "codes", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("codes", ArrayType(IntegerType)),
        StructField("ivf_cell", IntegerType)))))
      .parquet(s"$idx/codes")
      .select(col("vec_id"), col("ivf_cell"), posexplode(col("codes")).as(Seq("sub", "code")))
      .select(col("sub"), col("vec_id"), col("ivf_cell"), col("code").cast("long").as("code"))
    ivfPqServe(spark, dir, codes, books, cents)
  }

  private def rqAssignCte(name: String, centsCte: String, keep: String) =
    s"""$name AS (
       |  SELECT $keep FROM (
       |    SELECT e.sub, e.vec_id, e.sv, e.ivf_cell, c.cent_id AS cell,
       |           row_number() OVER (PARTITION BY e.sub, e.vec_id
       |             ORDER BY ${kmeansD2Sql("e.sv", "c.cvec")} ASC, c.cent_id ASC) AS rk
       |    FROM rq_es e JOIN $centsCte c ON c.sub = e.sub
       |  ) WHERE rk = 1
       |)""".stripMargin

  private def rqCentsCte(name: String, assignCteName: String) =
    s"""$name AS (
       |  SELECT sub, cell AS cent_id, list(mean ORDER BY dim) AS cvec FROM (
       |    SELECT sub, cell, dim, CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS mean
       |    FROM (SELECT sub, cell, unnest(generate_series(1, len(sv))) AS dim, unnest(sv) AS x
       |          FROM $assignCteName)
       |    GROUP BY sub, cell, dim
       |  ) GROUP BY sub, cell
       |)""".stripMargin

  /** The shared IVF-PQ oracle core: coarse kmeans chain → assigned →
    * residuals → residual subspaces → residual Lloyd chain. Terminal
    * residual codebooks live in CTE rq_c$PqIters; callers append their
    * own encode/serve CTEs. Shared by annIvfPqSql, the index-health
    * audit and the nprobe curve so the three oracles cannot drift.
    */
  private def ivfPqCoreSql(iters: Int): String = {
    val rqChain = (1 to PqIters)
      .flatMap(i => Seq(
        rqAssignCte(s"rq_a$i", s"rq_c${i - 1}", "sub, vec_id, sv, ivf_cell, cell"),
        rqCentsCte(s"rq_c$i", s"rq_a$i")))
      .mkString(",\n")
    s"""${kmeansChainSql(8, iters)},
       |${kmeansAssignCte("assigned", s"c$iters")},
       |resid AS (
       |  SELECT a.vec_id, a.cell AS ivf_cell,
       |         list_transform(generate_series(1, len(a.v)), i -> a.v[i] - c.cvec[i]) AS rv
       |  FROM assigned a JOIN c$iters c ON c.cent_id = a.cell
       |), rq_es AS (
       |  SELECT t.s AS sub, vec_id, ivf_cell,
       |         list_slice(rv, t.s * $PqDsub + 1, t.s * $PqDsub + $PqDsub) AS sv
       |  FROM resid, unnest(generate_series(0, ${PqM - 1})) AS t(s)
       |), rq_c0 AS (
       |  SELECT sub, vec_id AS cent_id, sv AS cvec FROM rq_es WHERE vec_id < $PqK
       |),
       |$rqChain""".stripMargin
  }

  /** DuckDB twin of annIvfPq: the coarse kmeans chain (shared with
    * ann_ivf_trained), residuals against the terminal centroids, the
    * residual per-subspace Lloyd chain (pqSqlChain's shape over rq_es),
    * probe + residual LUT + exact-DECIMAL ADC rank.
    */
  private val annIvfPqSql = {
    val iters = 3
    def d2(v: String, c: String) = kmeansD2Sql(v, c)
    s"""WITH ${ivfPqCoreSql(iters)},
       |${rqAssignCte("rq_codes", s"rq_c$PqIters", "sub, vec_id, ivf_cell, cell AS code")},
       |probed AS (
       |  SELECT q_id, cell, qr FROM (
       |    SELECT q.vec_id AS q_id, c.cent_id AS cell,
       |           list_transform(generate_series(1, len(q.v)), i -> q.v[i] - c.cvec[i]) AS qr,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${d2("q.v", "c.cvec")} ASC, c.cent_id ASC) AS rk
       |    FROM e q CROSS JOIN c$iters c WHERE q.vec_id < $NumQueries
       |  ) WHERE rk <= 2
       |), lut AS (
       |  SELECT p.q_id, p.cell, b.sub, b.cent_id AS code,
       |         ${d2(s"list_slice(p.qr, b.sub * $PqDsub + 1, b.sub * $PqDsub + $PqDsub)", "b.cvec")} AS pd2
       |  FROM probed p CROSS JOIN rq_c$PqIters b
       |), scan AS (
       |  SELECT l.q_id, k.vec_id, SUM(CAST(pd2 AS DECIMAL(30,10))) AS adc_dec
       |  FROM rq_codes k JOIN lut l
       |    ON l.cell = k.ivf_cell AND l.sub = k.sub AND l.code = k.code
       |  WHERE k.vec_id != l.q_id
       |  GROUP BY l.q_id, k.vec_id
       |), ranked AS (
       |  SELECT q_id, vec_id AS neighbor_id, adc_dec,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_dec ASC, vec_id ASC) AS BIGINT) AS rn
       |  FROM scan
       |)
       |SELECT q_id, neighbor_id,
       |       ${Det.roundSql("CAST(adc_dec AS DOUBLE)", 6)} AS adc, rn
       |FROM ranked WHERE rn <= $TopK
       |ORDER BY q_id, rn""".stripMargin
  }

  /** Per-cell health audit of the IVFADC index — the table an index
    * operator watches to decide WHEN TO RETRAIN: rows per coarse cell
    * (balance: a hot cell slows every query probing it; an empty cell
    * wastes a probe) and the mean/max PQ reconstruction error (sum over
    * subspaces of the residual-to-codeword squared distance — the
    * quantization loss ADC distances carry). Errors are exact-DECIMAL
    * per-vector sums, so DuckDB replays them hash-for-hash. Scale
    * shape: the encode is the same exchange-free in-row pass as
    * ann_ivfpq; the audit is two bounded hash aggregations (n rows →
    * n per-vector rows map-side-combined → k cells).
    */
  def annIndexHealth(spark: SparkSession, dir: String): DataFrame = {
    val k = IvfPqCoarseK; val iters = IvfPqCoarseIters
    val cents = trainCentroids(spark, dir, k, iters)
    val resSub = ivfPqResidSubspaces(spark, dir, cents)
    val books = trainIvfPqBooks(spark, dir, resSub)
    val perVec = pqAssign(spark, resSub, books, keep = Seq("ivf_cell"))
      .groupBy(col("vec_id"), col("ivf_cell"))
      .agg(sum(col("d2").cast(Det.Fine)).as("err"))
    perVec
      .groupBy(col("ivf_cell"))
      .agg(
        count(lit(1)).as("n_vecs"),
        Det.detRound(sum(col("err")).cast("double") / count(lit(1)), 6).as("mean_err"),
        Det.detRound(max(col("err")).cast("double"), 6).as("max_err"))
      .orderBy(col("ivf_cell"))
  }

  /** DuckDB twin: the shared IVF-PQ core, a d2-keeping encode CTE, the
    * same DECIMAL per-vector error sums and per-cell aggregates.
    */
  private val annIndexHealthSql = {
    val iters = 3
    def d2(v: String, c: String) = kmeansD2Sql(v, c)
    s"""WITH ${ivfPqCoreSql(iters)},
       |rq_h AS (
       |  SELECT sub, vec_id, ivf_cell, d2 FROM (
       |    SELECT e.sub, e.vec_id, e.ivf_cell, c.cent_id AS cell,
       |           ${d2("e.sv", "c.cvec")} AS d2,
       |           row_number() OVER (PARTITION BY e.sub, e.vec_id
       |             ORDER BY ${d2("e.sv", "c.cvec")} ASC, c.cent_id ASC) AS rk
       |    FROM rq_es e JOIN rq_c$PqIters c ON c.sub = e.sub
       |  ) WHERE rk = 1
       |), perv AS (
       |  SELECT vec_id, ivf_cell, SUM(CAST(d2 AS DECIMAL(30,10))) AS err
       |  FROM rq_h GROUP BY vec_id, ivf_cell
       |)
       |SELECT ivf_cell, count(*) AS n_vecs,
       |       ${Det.roundSql("CAST(SUM(err) AS DOUBLE) / count(*)", 6)} AS mean_err,
       |       ${Det.roundSql("CAST(MAX(err) AS DOUBLE)", 6)} AS max_err
       |FROM perv GROUP BY ivf_cell
       |ORDER BY ivf_cell""".stripMargin
  }

  /** Serving-cost-vs-recall tuning curve for the IVFADC index —
    * ann_nprobe_curve's sibling over ann_ivfpq: for nprobe ∈ {1, 2, 4},
    * the candidate volume (code groups the ADC scan touches) and the
    * recall of the ADC top-k against the STORED exact cosine anchor.
    * This is the table that prices widening the probe on the REAL
    * serving index (coarse prune + residual ADC), where the IVF curve
    * prices it on exact in-cell distances. Shape: encode once
    * (lineage-cut), the rk≤4 LUT built once and filtered per arm, every
    * arm's scan joins the LUT broadcast — three bounded passes over the
    * code stream, no corpus-keyed exchange.
    */
  def ivfPqNprobeCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = IvfPqCoarseK; val iters = IvfPqCoarseIters
    val cents = trainCentroids(spark, dir, k, iters)
    val resSub = ivfPqResidSubspaces(spark, dir, cents)
    val books = trainIvfPqBooks(spark, dir, resSub)
    val codes = pqAssign(spark, resSub, books, keep = Seq("ivf_cell"))
      .select(col("sub"), col("vec_id"), col("ivf_cell"), col("cell").cast("long").as("code"))
      .cutLineage(eager = false) // three arms share the encode
    val wProbe = Window.partitionBy(col("q_id")).orderBy(asc("d2"), asc("cent_id"))
    val probed4 = queries(spark, dir)
      .select(col("q_id"), expr("transform(q_vec, x -> CAST(x AS DOUBLE))").as("v"))
      .crossJoin(broadcast(cents.toDF("cent_id", "cent_vec")))
      .withColumn("d2", expr(KmeansDistExpr))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= 4)
      .select(
        col("q_id"), col("rk"), col("cent_id").as("lcell"),
        expr("zip_with(v, cent_vec, (a, b) -> a - b)").as("qr"))
    val lut4 = probed4
      .select(
        col("q_id"), col("rk"), col("lcell"),
        explode(expr(
          s"transform(sequence(0, ${PqM - 1}), " +
            s"s -> named_struct('sub', s, 'sv', slice(qr, s * $PqDsub + 1, $PqDsub)))")).as("p"))
      .select(col("q_id"), col("rk"), col("lcell"), col("p.sub").as("lsub"), col("p.sv").as("v"))
      .join(broadcast(books.toDF("bsub", "cent_id", "cent_vec")), col("lsub") === col("bsub"))
      .select(
        col("q_id"), col("rk"), col("lcell"), col("lsub"),
        col("cent_id").cast("long").as("lcode"), expr(KmeansDistExpr).as("pd2"))
      .cutLineage(eager = false)
    val exact  = annExactStored(spark, dir).select(col("q_id"), col("neighbor_id"))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val nQ     = queries(spark, dir).agg(count(lit(1)).as("n_queries"))
    val w = Window.partitionBy(col("q_id")).orderBy(asc("adc_dec"), asc("neighbor_id"))
    val arms = Seq(1, 2, 4).map { np =>
      val scan = codes
        .join(
          broadcast(lut4.filter(col("rk") <= np)),
          col("ivf_cell") === col("lcell") && col("sub") === col("lsub") &&
            col("code") === col("lcode"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("pd2").cast(Det.Fine)).as("adc_dec"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("adc_dec"))
        .cutLineage(eager = false) // candidate count + top-k share it
      val nCand = scan.agg(count(lit(1)).as("n_candidates"))
      val nHit = scan
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TopK)
        .join(exact, Seq("q_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      nCand
        .crossJoin(nHit)
        .crossJoin(nExact)
        .crossJoin(nQ)
        .select(
          lit(np.toLong).as("nprobe"),
          col("n_queries"),
          col("n_candidates"),
          when(col("n_queries") === 0, lit(0.0))
            .otherwise(Det.detRound(
              col("n_candidates").cast("double") / col("n_queries"), 6))
            .as("avg_candidates"),
          col("n_hit"),
          col("n_exact"),
          when(col("n_exact") === 0, lit(0.0))
            .otherwise(Det.detRound(
              col("n_hit").cast("double") / col("n_exact"), 6))
            .as("recall"))
    }
    arms.reduce(_ unionAll _).orderBy(col("nprobe"))
  }

  /** DuckDB twin: the shared IVF-PQ core + rq_codes, the rk≤4 probe
    * and LUT, then one scan/rank/measure chain per arm, unioned.
    */
  private val ivfPqNprobeCurveSql = {
    val iters = 3
    def d2(v: String, c: String) = kmeansD2Sql(v, c)
    def arm(np: Int) =
      s"""scan$np AS (
         |  SELECT l.q_id, k.vec_id AS neighbor_id,
         |         SUM(CAST(pd2 AS DECIMAL(30,10))) AS adc_dec
         |  FROM rq_codes k JOIN lut l
         |    ON l.cell = k.ivf_cell AND l.sub = k.sub AND l.code = k.code
         |  WHERE k.vec_id != l.q_id AND l.rk <= $np
         |  GROUP BY l.q_id, k.vec_id
         |), hit$np AS (
         |  SELECT count(*) AS n_hit FROM (
         |    SELECT q_id, neighbor_id,
         |           row_number() OVER (PARTITION BY q_id ORDER BY adc_dec ASC, neighbor_id ASC) AS rn
         |    FROM scan$np
         |  ) r JOIN exact x ON r.q_id = x.q_id AND r.neighbor_id = x.neighbor_id
         |  WHERE r.rn <= $TopK
         |), m$np AS (
         |  SELECT CAST($np AS BIGINT) AS nprobe,
         |         (SELECT n_queries FROM nq) AS n_queries,
         |         (SELECT count(*) FROM scan$np) AS n_candidates,
         |         (SELECT n_hit FROM hit$np) AS n_hit,
         |         (SELECT count(*) FROM exact) AS n_exact
         |)""".stripMargin
    s"""WITH ${ivfPqCoreSql(iters)},
       |${rqAssignCte("rq_codes", s"rq_c$PqIters", "sub, vec_id, ivf_cell, cell AS code")},
       |probed AS (
       |  SELECT q_id, rk, cell, qr FROM (
       |    SELECT q.vec_id AS q_id, c.cent_id AS cell,
       |           list_transform(generate_series(1, len(q.v)), i -> q.v[i] - c.cvec[i]) AS qr,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${d2("q.v", "c.cvec")} ASC, c.cent_id ASC) AS rk
       |    FROM e q CROSS JOIN c$iters c WHERE q.vec_id < $NumQueries
       |  ) WHERE rk <= 4
       |), lut AS (
       |  SELECT p.q_id, p.rk, p.cell, b.sub, b.cent_id AS code,
       |         ${d2(s"list_slice(p.qr, b.sub * $PqDsub + 1, b.sub * $PqDsub + $PqDsub)", "b.cvec")} AS pd2
       |  FROM probed p CROSS JOIN rq_c$PqIters b
       |), exact AS (
       |  SELECT q_id, neighbor_id FROM (
       |    SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${Det.roundSql("list_cosine_similarity(q.v, c.v)", 6)} DESC, c.vec_id) AS rn
       |    FROM e q JOIN e c ON c.vec_id != q.vec_id
       |    WHERE q.vec_id < $NumQueries
       |  ) WHERE rn <= $TopK
       |), nq AS (
       |  SELECT count(*) AS n_queries FROM e WHERE vec_id < $NumQueries
       |),
       |${arm(1)}, ${arm(2)}, ${arm(4)}
       |SELECT nprobe, n_queries, n_candidates,
       |       CASE WHEN n_queries = 0 THEN 0.0
       |            ELSE ${Det.roundSql("CAST(n_candidates AS DOUBLE) / n_queries", 6)} END AS avg_candidates,
       |       n_hit, n_exact,
       |       CASE WHEN n_exact = 0 THEN 0.0
       |            ELSE ${Det.roundSql("CAST(n_hit AS DOUBLE) / n_exact", 6)} END AS recall
       |FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m4)
       |ORDER BY nprobe""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "ann_ivfpq"         -> QueryDef(annIvfPq, Some(annIvfPqSql)),
    "ann_filtered"      -> QueryDef(annFiltered, Some(annFilteredSql)),
    "ann_index_health"  -> QueryDef(annIndexHealth, Some(annIndexHealthSql)),
    "ivfpq_nprobe_curve" -> QueryDef(ivfPqNprobeCurve, Some(ivfPqNprobeCurveSql)),
    // identical to ann_ivfpq by construction (shared ivfPqServe over
    // the stored codes) — shares its oracle
    "ann_ivfpq_stored"  -> QueryDef(annIvfPqStored, Some(annIvfPqSql)),
    "label_noise_report" -> QueryDef(labelNoiseReport, Some(labelNoiseReportSql)),
    "embedding_knn_eval" -> QueryDef(embeddingKnnEval, Some(embeddingKnnEvalSql)),
    "ann_ivf_incremental" -> QueryDef(annIvfIncremental, Some(annIvfIncrementalSql)),
    "ann_nprobe_curve"  -> QueryDef(annNprobeCurve, Some(annNprobeCurveSql)),
    "semantic_dedup"    -> QueryDef(semanticDedup, Some(semanticDedupSql)),
    "ann_recall"        -> QueryDef(annRecall, Some(annRecallSql)),
    "retrieval_eval"    -> QueryDef(retrievalEval, Some(retrievalEvalSql)),
    "ann_pq"            -> QueryDef(annPq, Some(annPqSql)),
    // identical to ann_pq by construction (the stored index must serve
    // exactly what the in-plan build computes) — shares its oracle
    "ann_pq_stored"     -> QueryDef(annPqStored, Some(annPqSql)),
    "ann_cosine_topk"   -> QueryDef(annCosineTopK, Some(annCosineTopKSql)),
    "embedding_neardup" -> QueryDef(embeddingNeardup, Some(embeddingNeardupSql)),
    "ann_lsh"           -> QueryDef(annLsh, Some(annLshSql)),
    "ann_ivf"           -> QueryDef(annIvf, Some(annIvfSql)),
    "embedding_kmeans"  -> QueryDef(embeddingKmeans, Some(embeddingKmeansSql)),
    "embedding_outliers" -> QueryDef(embeddingOutliers, Some(embeddingOutliersSql)),
    "embedding_centroid_drift" ->
      QueryDef(embeddingCentroidDrift, Some(embeddingCentroidDriftSql)),
    "embedding_neardup_lsh" -> QueryDef(embeddingNeardupLsh, Some(embeddingNeardupLshSql)),
    "neardup_threshold_curve" -> QueryDef(neardupThresholdCurve, Some(neardupThresholdCurveSql)),
    "embedding_quantize"    -> QueryDef(embeddingQuantize, Some(embeddingQuantizeSql)),
    "embedding_pca_variance" -> QueryDef(embeddingPcaVariance, Some(embeddingPcaVarianceSql)),
    "embedding_norm_profile" -> QueryDef(embeddingNormProfile, Some(embeddingNormProfileSql)),
    "ann_ivf_trained"       -> QueryDef(annIvfTrained, Some(annIvfTrainedSql)),
    // identical results by construction — the stored index must serve
    // exactly what the in-plan build computes, so it shares the oracle
    "ann_ivf_stored"        -> QueryDef(annIvfStored, Some(annIvfTrainedSql)))
}
