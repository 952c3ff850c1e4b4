package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.Ckpt.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline plumbing (round 4 of the LLM-pipeline tier):
  * document chunking, boilerplate detection, Bloom-pruned joins,
  * incremental view maintenance, deterministic corpus sharding, and
  * hash-based dataset splits. The reference's batch-analytics surface
  * (SURVEY.md §3) stops at per-table reports; these are the operators a
  * 100 TB corpus build needs BETWEEN those reports.
  *
  * Scale notes:
  *  - chunking / splitting are pure in-row transforms — zero shuffle,
  *    whole-stage codegen end to end.
  *  - boilerplate detection shuffles (doc, shingle) partials then shingle
  *    totals — two map-side-combined aggregations; at 100 TB the group key
  *    becomes xxhash64(shingle) (collision-tolerant there, not in an
  *    exactness gate).
  *  - the Bloom prefilter broadcasts a constant-size bitset (8 KiB here)
  *    instead of the build side's key set, so probe-side pruning costs
  *    O(1) memory per executor no matter how large the build side grows.
  *  - incremental merge touches the delta + the prior view only — the
  *    historical raw events are never rescanned.
  *  - corpus shard assignment uses the range-bucketed global rank
  *    (Rank.withGlobalRank) — no single-partition window anywhere.
  */
object Pipeline {

  // ---------------------------------------------------------------- chunks

  private val ChunkW = 32 // window: tokens per chunk
  private val ChunkS = 24 // stride: 8-token overlap between neighbors

  /** Overlapping fixed-window chunking — split each document into
    * `ChunkW`-token windows every `ChunkS` tokens (the standard context-
    * window preparation pass). Chunk count = 1 for short docs, else
    * ceil((n-W)/S)+1 so the last window always reaches the end of the
    * document. Emits one row per chunk with its token offset, length and
    * content fingerprint. In-row transform + posexplode: no shuffle at
    * all — at 100 TB this runs at scan speed.
    */
  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn(
        "nc",
        when(size(col("t")) <= ChunkW, lit(1)).otherwise(
          ceil((size(col("t")) - lit(ChunkW)).cast("double") / ChunkS).cast("int") + 1))
      .select(
        col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, nc - 1), i -> concat_ws(' ', slice(t, i*$ChunkS + 1, $ChunkW)))"))
          .as(Seq("chunk_id", "chunk")))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * ChunkS).cast("long").as("chunk_start"),
        size(split(col("chunk"), " ")).cast("long").as("n_tokens"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val docChunksSql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), n AS (
       |  SELECT doc_id, t,
       |         CASE WHEN len(t) <= $ChunkW THEN 1
       |              ELSE CAST(ceil((len(t) - $ChunkW) / CAST($ChunkS AS DOUBLE)) AS INT) + 1
       |         END AS nc
       |  FROM t
       |), c AS (
       |  SELECT doc_id, i AS chunk_id,
       |         array_to_string(list_slice(t, i*$ChunkS + 1, i*$ChunkS + $ChunkW), ' ') AS chunk
       |  FROM n, LATERAL (SELECT unnest(generate_series(0, nc - 1)) AS i)
       |)
       |SELECT doc_id,
       |       CAST(chunk_id AS BIGINT) AS chunk_id,
       |       CAST(chunk_id * $ChunkS AS BIGINT) AS chunk_start,
       |       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens,
       |       md5(chunk) AS chunk_md5
       |FROM c
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** Chunk-level deduplication accounting: the chunking pass above makes
    * dedup granular — a boilerplate paragraph repeated across documents
    * dedups at chunk level even when whole-document hashes differ. Top
    * repeated chunk fingerprints with occurrence/document counts; rides
    * the docChunks frame, so the grouping key is the 32-char md5, never
    * chunk text.
    */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame =
    docChunks(spark, dir)
      .groupBy(col("chunk_md5"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        max(col("n_tokens")).as("n_tokens"))
      .filter(col("n_occurrences") >= 2)
      .orderBy(desc("n_occurrences"), desc("n_docs"), asc("chunk_md5"))
      .limit(20)

  private lazy val chunkDedupSql = {
    // docChunksSql minus its trailing ORDER BY, reused as a CTE body
    val chunkCte = docChunksSql.linesIterator
      .takeWhile(!_.startsWith("ORDER BY"))
      .mkString("\n")
    s"""WITH chunks AS (
       |${chunkCte.linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT chunk_md5, count(*) AS n_occurrences,
       |       count(DISTINCT doc_id) AS n_docs,
       |       CAST(max(n_tokens) AS BIGINT) AS n_tokens
       |FROM chunks
       |GROUP BY chunk_md5
       |HAVING count(*) >= 2
       |ORDER BY n_occurrences DESC, n_docs DESC, chunk_md5
       |LIMIT 20""".stripMargin
  }

  // ----------------------------------------------------------- boilerplate

  private val BoilerN       = 8 // shingle width (tokens)
  private val BoilerMinDocs = 3 // "boilerplate" = appears in >= 3 documents

  /** Cross-document boilerplate detection: word 8-grams appearing in at
    * least `BoilerMinDocs` DISTINCT documents, ranked by document
    * frequency — the pass that finds repeated headers/footers/disclaimers
    * so they can be stripped before training. Two-level aggregation:
    * per-(doc, shingle) occurrence counts first (map-side combinable),
    * then per-shingle doc/occurrence totals; n_docs is a plain count
    * because level 1 already collapsed duplicates — no count-distinct
    * state anywhere.
    */
  def boilerplateNgrams(spark: SparkSession, dir: String): DataFrame = {
    // scan-fan (guide §2.5): the n-gram window expansion is per-row CPU
    Tables
      .documentsFanned(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= BoilerN)
      .select(
        col("doc_id"),
        explode(expr(
          s"transform(sequence(0, size(t) - $BoilerN), i -> concat_ws(' ', slice(t, i + 1, $BoilerN)))"))
          .as("s"))
      .groupBy(col("doc_id"), col("s"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("n_occurrences"))
      .filter(col("n_docs") >= BoilerMinDocs)
      .orderBy(desc("n_docs"), desc("n_occurrences"), asc("s"))
      .limit(20)
  }

  private val boilerplateNgramsSql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), occ AS (
       |  SELECT doc_id, array_to_string(list_slice(t, i, i + ${BoilerN - 1}), ' ') AS s
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(t) - ${BoilerN - 1})) AS i)
       |  WHERE len(t) >= $BoilerN
       |), per_doc AS (
       |  SELECT doc_id, s, count(*) AS c FROM occ GROUP BY doc_id, s
       |)
       |SELECT s, count(*) AS n_docs, CAST(SUM(c) AS BIGINT) AS n_occurrences
       |FROM per_doc
       |GROUP BY s
       |HAVING count(*) >= $BoilerMinDocs
       |ORDER BY n_docs DESC, n_occurrences DESC, s
       |LIMIT 20""".stripMargin

  private val StripTopK = 100 // bounded boilerplate set → broadcastable

  /** Boilerplate STRIP accounting — the transform that acts on what
    * [[boilerplateNgrams]] detects: the top-`StripTopK` boilerplate
    * 8-grams (same n_docs ≥ [[BoilerMinDocs]] definition, ranked by doc
    * frequency with full tie-breaks) are broadcast back against every
    * document's shingle stream, each hit covers its 8 token positions,
    * and the per-source report says how many documents are touched and
    * what fraction of the corpus' tokens a strip pass would delete —
    * the before/after ledger a curation pipeline publishes with every
    * cleaning rule it ships.
    *
    * Overlapping hits must not double-count (two overlapping 8-gram
    * occurrences covering 12 distinct tokens remove 12, not 16): each
    * hit explodes to its 8 covered positions and a per-(doc, position)
    * two-stage hash agg takes the union — both stages map-side partial,
    * linear in hit volume, no per-doc buffering anywhere.
    *
    * Scale: the strip SET is explicitly bounded (top-K by doc
    * frequency), never "everything above the threshold" — at 100 TB the
    * ≥3-docs shingle family is itself unbounded, but the top-100 frame
    * is a TakeOrderedAndProject over the detection agg, broadcast as
    * ~100 strings to the probe scan. The probe join is a BHJ at the
    * shingle stream, so nothing quadratic and no shuffle carries text
    * wider than one shingle.
    */
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    // scan-fan (guide §2.5) + ONE window expansion: occ feeds both the
    // boiler selection (via the broadcast subtree) and the coverage
    // join, and nothing between the scan and occ is an exchange Spark
    // could reuse — without the lazy cut the n-gram string expansion
    // ran TWICE, both times on the source's single task (StageProfile:
    // 0.72 s + 0.51 s one-task stages).
    val docs = Tables
      .documentsFanned(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
    val occ = graft.Ckpt.cut(
      docs
        .filter(size(col("t")) >= BoilerN)
        .select(
          col("doc_id"),
          posexplode(expr(
            s"transform(sequence(0, size(t) - $BoilerN), i -> concat_ws(' ', slice(t, i + 1, $BoilerN)))"))
            .as(Seq("pos", "s"))),
      eager = false)
    val boiler = occ
      .groupBy(col("doc_id"), col("s"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("n_occ"))
      .filter(col("n_docs") >= BoilerMinDocs)
      .orderBy(desc("n_docs"), desc("n_occ"), asc("s"))
      .limit(StripTopK)
      .select(col("s"))
    val covered = occ
      .join(broadcast(boiler), "s")
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${BoilerN - 1})")).as("p"))
      .groupBy(col("doc_id"), col("p"))
      .agg(lit(1))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("removed"))
    docs
      .select(col("doc_id"), col("source"), size(col("t")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("removed") > 0L, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(coalesce(col("removed"), lit(0L))).as("tokens_removed"))
      .select(
        col("source"), col("n_docs"), col("n_docs_hit"),
        col("tokens_total"), col("tokens_removed"),
        when(coalesce(col("tokens_total"), lit(0L)) === 0L, lit(null).cast("double"))
          .otherwise(Det.detRound(
            col("tokens_removed").cast("double") / col("tokens_total"), 6))
          .as("pct_removed"))
      .orderBy(asc_nulls_last("source"))
  }

  private val boilerplateStripSql =
    s"""WITH t AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
       |), occ AS (
       |  SELECT doc_id, i - 1 AS pos,
       |         array_to_string(list_slice(t, i, i + ${BoilerN - 1}), ' ') AS s
       |  FROM t, LATERAL (SELECT unnest(generate_series(1, len(t) - ${BoilerN - 1})) AS i)
       |  WHERE len(t) >= $BoilerN
       |), per_doc AS (
       |  SELECT doc_id, s, count(*) AS c FROM occ GROUP BY doc_id, s
       |), boiler AS (
       |  SELECT s FROM (
       |    SELECT s, count(*) AS n_docs, SUM(c) AS n_occ
       |    FROM per_doc GROUP BY s HAVING count(*) >= $BoilerMinDocs
       |  ) ORDER BY n_docs DESC, n_occ DESC, s LIMIT $StripTopK
       |), cov AS (
       |  SELECT doc_id, count(*) AS removed FROM (
       |    SELECT DISTINCT o.doc_id, u.p
       |    FROM occ o JOIN boiler b USING (s),
       |         LATERAL (SELECT unnest(generate_series(o.pos, o.pos + ${BoilerN - 1})) AS p) u
       |  ) GROUP BY doc_id
       |), d AS (
       |  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens FROM t
       |)
       |SELECT source,
       |       count(*) AS n_docs,
       |       CAST(SUM(CASE WHEN removed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
       |       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       |       CAST(SUM(COALESCE(removed, 0)) AS BIGINT) AS tokens_removed,
       |       CASE WHEN COALESCE(SUM(n_tokens), 0) = 0 THEN NULL
       |            ELSE ${Det.roundSql("CAST(SUM(COALESCE(removed, 0)) AS DOUBLE) / SUM(n_tokens)", 6)}
       |       END AS pct_removed
       |FROM d LEFT JOIN cov USING (doc_id)
       |GROUP BY source
       |ORDER BY source NULLS LAST""".stripMargin

  // ----------------------------------------------------------- bloom join

  val BloomNumBits   = 1 << 16 // 8 KiB bitset
  val BloomNumHashes = 4

  /** Probe-side membership test against a finished BloomBits bitset.
    * Columns h1/h2 must be the SAME xxhash64 pair the filter was built
    * from; positions mirror BloomBits.reduce exactly (hashes reduced mod
    * the table size first, then Kirsch-Mitzenmacher probing). Pure
    * builtin expressions — the probe stays inside whole-stage codegen.
    */
  def bloomMightContain(
      bitsCol: String, h1Col: String, h2Col: String): Column = {
    val m  = BloomNumBits
    val g1 = s"pmod($h1Col, ${m}L)"
    val g2 = s"(pmod($h2Col, ${m - 1}L) + 1L)"
    (0 until BloomNumHashes)
      .map { i =>
        val pos = s"pmod($g1 + ${i}L * $g2, ${m}L)"
        expr(
          s"((element_at($bitsCol, CAST($pos DIV 64 AS INT) + 1) >> CAST($pos % 64 AS INT)) & 1) = 1")
      }
      .reduce(_ && _)
  }

  /** Bloom-pruned fact-dim join: Q1-1995 orders are the (filtered) build
    * side; a BloomBits filter over their order keys is broadcast and
    * applied to every lineitem BEFORE the join shuffle, so ~96% of the
    * fact table is dropped at scan site; the exact equi-join on the
    * survivors then removes the (rare) false positives — final semantics
    * are exactly the plain join, which is what the oracle runs. This is
    * the engine-level form of runtime row filtering: at 100 TB the 8 KiB
    * bitset replaces shipping a multi-GB build-side key set to every
    * executor.
    */
  def bloomJoinPrune(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables
      .orders(spark, dir)
      .filter(col("o_orderdate").between("1995-01-01", "1995-03-31"))
    val bloom = orders
      .select(
        xxhash64(col("o_orderkey")).as("h1"),
        xxhash64(lit("graft-bloom"), col("o_orderkey")).as("h2"))
      .agg(graft.functions.BloomBits
        .udf(BloomNumBits, BloomNumHashes)(col("h1"), col("h2"))
        .as("bits"))
    val pruned = Tables
      .lineitem(spark, dir)
      .withColumn("h1", xxhash64(col("l_orderkey")))
      .withColumn("h2", xxhash64(lit("graft-bloom"), col("l_orderkey")))
      .crossJoin(broadcast(bloom))
      .filter(bloomMightContain("bits", "h1", "h2"))
    pruned
      .join(
        broadcast(orders.select(col("o_orderkey"), col("o_orderpriority"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        Det.detRound(
          Det.fineSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(asc_nulls_last("o_orderpriority"), asc_nulls_last("l_returnflag"))
  }

  private val bloomJoinPruneSql =
    s"""SELECT o.o_orderpriority, l.l_returnflag,
       |       count(*) AS n_items,
       |       ${Det.roundSql(
        "CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE)",
        2)} AS revenue
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
       |GROUP BY o.o_orderpriority, l.l_returnflag
       |ORDER BY o.o_orderpriority, l.l_returnflag""".stripMargin

  // ---------------------------------------------------- incremental merge

  /** 2024-01-21T00:00:00Z in epoch microseconds — splits the 30-day event
    * window into a 20-day "already materialized" view and a 10-day delta.
    */
  private val MergeCutUs = 1705795200000000L

  /** Incremental aggregate maintenance: per-user event totals kept as a
    * materialized partial (count + DECIMAL sum over days 1-20), merged
    * with the day-21+ delta by re-aggregating the PARTIALS — the
    * historical raw events are read once into the view and never again.
    * Count and decimal-sum are commutative monoids, so merged partials
    * are bit-identical to the full recompute the oracle runs; the
    * old/new per-source counts are carried through the merge to make the
    * two-phase structure visible in the output.
    */
  def incrementalAggMerge(spark: SparkSession, dir: String): DataFrame = {
    def partial(f: DataFrame): DataFrame =
      f.filter(col("user_id").isNotNull) // user-grain: anonymous events excluded
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(Det.Money)).as("v"))
    // each side's time bound goes through eventsBetween so the range
    // predicate lands on the RAW ts column and pushes to the parquet
    // scan — the "historical raw events are read once" claim only holds
    // at 100 TB if the view side's scan can actually prune row groups
    val view = partial(
      Tables.eventsBetween(spark, dir, Long.MinValue, MergeCutUs))
    val delta = partial(
      Tables.eventsBetween(spark, dir, MergeCutUs, Long.MaxValue))
    view
      .withColumn("src", lit("old"))
      .unionByName(delta.withColumn("src", lit("new")))
      .groupBy(col("user_id"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("v")).cast("double").as("total_value"),
        sum(when(col("src") === "old", col("n_events")).otherwise(0L)).as("n_events_old"),
        sum(when(col("src") === "new", col("n_events")).otherwise(0L)).as("n_events_new"))
      .orderBy(col("user_id"))
  }

  private val incrementalAggMergeSql =
    s"""SELECT user_id,
       |       count(*) AS n_events,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       |       CAST(count(*) FILTER (WHERE epoch_us(ts) < $MergeCutUs) AS BIGINT) AS n_events_old,
       |       CAST(count(*) FILTER (WHERE epoch_us(ts) >= $MergeCutUs) AS BIGINT) AS n_events_new
       |FROM events
       |WHERE user_id IS NOT NULL
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------- corpus shard

  private val ShardSize = 64

  /** Deterministic training-order assignment: every document gets a
    * global (shard, position) from its rank under a portable 60-bit
    * content-independent hash — the reproducible corpus shuffle that
    * precedes sequence packing. Rank comes from Rank.withGlobalRank
    * (range-bucketed: per-bucket parallel windows + broadcast offsets,
    * never a single-partition window), so the assignment is exact AND
    * cluster-shaped. Hash is Spark conv(substr(md5,1,15),16,10) ≡ DuckDB
    * ('0x' || substr(md5,1,15))::BIGINT — both engines rank the same
    * order.
    */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame = {
    val hashed = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
    Rank
      .withGlobalRank(hashed, "h", tieBreak = Seq("doc_id"))
      .select(
        col("doc_id"),
        col("h"),
        expr(s"CAST((rn - 1) DIV $ShardSize AS BIGINT)").as("shard"),
        expr(s"CAST((rn - 1) % $ShardSize AS BIGINT)").as("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  private val corpusShuffleSql =
    s"""WITH h AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, h, row_number() OVER (ORDER BY h, doc_id) AS rn FROM h
       |)
       |SELECT doc_id, h,
       |       CAST((rn - 1) // $ShardSize AS BIGINT) AS shard,
       |       CAST((rn - 1) % $ShardSize AS BIGINT) AS pos
       |FROM r
       |ORDER BY shard, pos""".stripMargin

  // ------------------------------------------------------- dataset split

  /** Hash-based train/val/test assignment with per-language accounting:
    * split = first hex digit of md5("split:" || doc_id) — 0..b train
    * (75%), c..d val (12.5%), e..f test (12.5%). Salted-hash splits are
    * the 100 TB standard because they are stable under corpus growth (a
    * document's split never changes when neighbors arrive) and need no
    * coordination — pure per-row arithmetic, zero shuffle before the
    * tiny per-(lang, split) rollup.
    */
  /** First hex digit of the salted split hash — THE split-assignment
    * expression. dataset_split ships it and split_drift_psi grades it;
    * both MUST read the same digit, so it lives in exactly one place
    * (plus its SQL twin below). Boundaries: ≤'b' train (12/16), ≤'d'
    * val (2/16), else test.
    */
  private def splitDigit: Column =
    substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 1)

  private val splitDigitSql =
    "substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)"

  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = Tables
      .documents(spark, dir)
      .withColumn("hd", splitDigit)
      .withColumn(
        "split",
        when(col("hd") <= "b", "train")
          .when(col("hd") <= "d", "val")
          .otherwise("test"))
    assigned
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn(
        "share",
        Det.detRound(
          col("n_docs").cast("double") /
            sum(col("n_docs")).over(Window.partitionBy(col("lang"))),
          6))
      .orderBy(asc_nulls_last("lang"), col("split"))
  }

  private val datasetSplitSql =
    s"""WITH a AS (
       |  SELECT lang, n_chars,
       |         CASE WHEN ${splitDigitSql} <= 'b' THEN 'train'
       |              WHEN ${splitDigitSql} <= 'd' THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents
       |), g AS (
       |  SELECT lang, split, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |  FROM a GROUP BY lang, split
       |)
       |SELECT lang, split, n_docs, n_chars,
       |       ${Det.roundSql(
        "CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY lang)",
        6)} AS share
       |FROM g
       |ORDER BY lang, split""".stripMargin

  // --------------------------------------------------------- SCD-2 merge

  /** Slowly-changing-dimension (type 2) history build: each customer's
    * order stream is folded into versioned attribute rows — a new
    * version opens only when the tracked attribute (order priority here)
    * actually CHANGES, with [valid_from, valid_to) validity and an
    * is_current flag on the open version. The standard warehouse
    * dimension-versioning pass, expressed as two per-key window passes
    * (change detection via lag, interval close via lead) — both windows
    * partition by customer, so the work is embarrassingly parallel and
    * shuffles each key group once; no global window anywhere.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val changes = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey").as("custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("dt"),
        col("o_orderkey"),
        col("o_orderpriority").as("attr"),
        lag(col("o_orderpriority"), 1).over(byKey).as("prev"))
      .filter(col("prev").isNull || col("attr") =!= col("prev"))
    val byVersion = Window
      .partitionBy(col("custkey"))
      .orderBy(col("dt"), col("o_orderkey"))
    changes
      .select(
        col("custkey"),
        col("attr"),
        col("dt").as("valid_from"),
        lead(col("dt"), 1).over(byVersion).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("custkey"), col("valid_from"), col("attr"), asc_nulls_first("valid_to"))
  }

  private val scd2HistorySql =
    """WITH v AS (
      |  SELECT o_custkey AS custkey,
      |         strftime(o_orderdate, '%Y-%m-%d') AS dt,
      |         o_orderkey,
      |         o_orderpriority AS attr,
      |         lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders
      |), changes AS (
      |  SELECT custkey, dt, o_orderkey, attr FROM v
      |  WHERE prev IS NULL OR attr <> prev
      |)
      |SELECT custkey, attr, dt AS valid_from,
      |       lead(dt) OVER (PARTITION BY custkey ORDER BY dt, o_orderkey) AS valid_to,
      |       (lead(dt) OVER (PARTITION BY custkey ORDER BY dt, o_orderkey) IS NULL) AS is_current
      |FROM changes
      |ORDER BY custkey, valid_from, attr, valid_to NULLS FIRST""".stripMargin

  /** Point-in-time (temporal) join against the SCD-2 history: every
    * order is enriched with the attribute VERSION that was valid on its
    * order date — equi-join on the dimension key plus the half-open
    * interval residual `valid_from <= dt < valid_to`. Versions opening
    * on the same day collapse to empty intervals, so each fact matches
    * EXACTLY one version (spec-asserted); rolled up by version attribute
    * to keep the output small. The plan is the scalable PIT shape: hash
    * join on the key (version lists per key are short by construction),
    * interval check as a residual filter — never a range-only join.
    */
  def scd2PitJoin(spark: SparkSession, dir: String): DataFrame = {
    val versions = scd2History(spark, dir)
      .select(col("custkey"), col("attr"), col("valid_from"), col("valid_to"))
    val orders = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("dt"),
        col("o_totalprice"))
    orders
      .join(
        versions,
        orders("o_custkey") === versions("custkey") &&
          col("valid_from") <= col("dt") &&
          (col("valid_to").isNull || col("dt") < col("valid_to")))
      .groupBy(col("attr"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.detRound(Det.moneySum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(asc_nulls_last("attr"))
  }

  private val scd2PitJoinSql =
    """WITH v AS (
      |  SELECT o_custkey AS custkey,
      |         strftime(o_orderdate, '%Y-%m-%d') AS dt,
      |         o_orderkey,
      |         o_orderpriority AS attr,
      |         lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders
      |), changes AS (
      |  SELECT custkey, dt, o_orderkey, attr FROM v
      |  WHERE prev IS NULL OR attr <> prev
      |), hist AS (
      |  SELECT custkey, attr, dt AS valid_from,
      |         lead(dt) OVER (PARTITION BY custkey ORDER BY dt, o_orderkey) AS valid_to
      |  FROM changes
      |)
      |SELECT h.attr, count(*) AS n_orders,
      |       """.stripMargin +
      Det.roundSql(
        "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)", 2) +
      """ AS revenue
      |FROM orders o
      |JOIN hist h
      |  ON o.o_custkey = h.custkey
      | AND h.valid_from <= strftime(o.o_orderdate, '%Y-%m-%d')
      | AND (h.valid_to IS NULL OR strftime(o.o_orderdate, '%Y-%m-%d') < h.valid_to)
      |GROUP BY h.attr
      |ORDER BY h.attr""".stripMargin

  /** Time-ordered train/eval split of the event stream: everything
    * before the 80%-of-span cutoff trains, the rest evaluates — the
    * split discipline time-series models require (a hash split leaks
    * the future into training). Emits per-split row/user counts plus
    * the USER-overlap count, the leakage metric deciding between
    * per-user and per-time splitting. Cutoff arithmetic is exact
    * integer µs; the overlap semi-join runs on user-distinct frames,
    * never raw events.
    */
  def temporalSplit(spark: SparkSession, dir: String): DataFrame = {
    // null users carry no leakage identity; dropping them on BOTH sides
    // keeps the Spark rollup count and the oracle's count(DISTINCT ...)
    // (which skips NULLs) in lockstep
    val e = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"))
      .filter(col("user_id").isNotNull)
    // span bounds as a broadcast 1-row frame — NOT an unpartitioned
    // window, which would funnel the whole fact table into one partition
    val bounds = e.agg(min(col("ts")).as("t_min"), max(col("ts")).as("t_max"))
    val tagged = e
      .crossJoin(broadcast(bounds))
      // integer div on both sides: `/` is FLOAT division in Spark and
      // DuckDB alike, and a float cutoff would round differently
      .withColumn("cutoff", col("t_min") + expr("((t_max - t_min) * 4) div 5"))
      .withColumn("split", when(col("ts") < col("cutoff"), "train").otherwise("eval"))
    // ONE fact-sized aggregate at (split, user) grain feeds both
    // outputs; the lazy checkpoint pins the user-sized frame to a
    // single computation
    val perUser = tagged
      .groupBy(col("split"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .cutLineage(eager = false)
    val perSplit = perUser
      .groupBy(col("split"))
      .agg(
        sum(col("n")).cast("long").as("n_events"),
        count(lit(1)).as("n_users"))
    val overlap = perUser
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_splits"))
      .filter(col("n_splits") === 2)
      .agg(count(lit(1)).as("n_overlap_users"))
    perSplit
      .crossJoin(broadcast(overlap))
      .select(
        col("split"), col("n_events"), col("n_users"), col("n_overlap_users"),
        Det.detRound(
          col("n_overlap_users").cast("double") / col("n_users"), 6)
          .as("leakage_rate"))
      .orderBy(col("split"))
  }

  private val temporalSplitSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts FROM events
      |  WHERE user_id IS NOT NULL
      |), bounds AS (
      |  SELECT MIN(ts) AS t_min, MAX(ts) AS t_max FROM e
      |), tagged AS (
      |  SELECT e.user_id,
      |         CASE WHEN e.ts < b.t_min + (b.t_max - b.t_min) * 4 // 5
      |              THEN 'train' ELSE 'eval' END AS split
      |  FROM e, bounds b
      |), per_split AS (
      |  SELECT split, count(*) AS n_events,
      |         count(DISTINCT user_id) AS n_users
      |  FROM tagged GROUP BY split
      |), overlap AS (
      |  SELECT count(*) AS n_overlap_users FROM (
      |    SELECT user_id FROM (SELECT DISTINCT split, user_id FROM tagged)
      |    GROUP BY user_id HAVING count(*) = 2
      |  )
      |)
      |SELECT split, CAST(n_events AS BIGINT) AS n_events,
      |       CAST(n_users AS BIGINT) AS n_users,
      |       CAST(n_overlap_users AS BIGINT) AS n_overlap_users,
      |       floor((CAST(n_overlap_users AS DOUBLE) / n_users)*1e6 + 0.5)/1e6 AS leakage_rate
      |FROM per_split, overlap
      |ORDER BY split""".stripMargin

  /** Split drift report: PSI (population stability index — the
    * standard model-monitoring drift measure, public) of the
    * token-length distribution between the train and val splits under
    * the SAME salted-hash assignment dataset_split ships. A healthy
    * hash split should show near-zero PSI; a biased one (e.g. split by
    * ingestion order when length drifts over time) shows up as
    * psi_total > 0.2 — this is the check you run BEFORE trusting a
    * split for held-out evaluation. Fixed doubling length bins keep
    * the histogram deterministic at any scale; Laplace-smoothed shares
    * (+0.5 per bin) keep ln() defined on empty bins, mirrored exactly
    * in the oracle. One scan, one tiny two-level aggregate — only
    * (bin, split) counts ever shuffle; the total-PSI window runs over
    * a ≤6-row frame.
    */
  /** The fixed PSI histogram support. The smoothing denominator and the
    * output row set are pinned to ALL of these bins — a bin empty in
    * both splits still contributes its smoothed (nonzero) PSI term, and
    * the reported shares always sum to 1.
    */
  private val PsiBins = Seq(0L, 50L, 100L, 200L, 400L, 800L)

  def splitDriftPsi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nBins = PsiBins.size
    val assigned = Tables
      .documents(spark, dir)
      .withColumn("hd", splitDigit)
      .filter(col("hd") <= "d") // train ∪ val only
      .withColumn("split", when(col("hd") <= "b", "train").otherwise("val"))
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn(
        "bin_lo",
        when(col("n_tokens") < 50, 0L)
          .when(col("n_tokens") < 100, 50L)
          .when(col("n_tokens") < 200, 100L)
          .when(col("n_tokens") < 400, 200L)
          .when(col("n_tokens") < 800, 400L)
          .otherwise(800L))
    import spark.implicits._
    val binned = PsiBins
      .toDF("bin_lo")
      .join(
        assigned
          .groupBy(col("bin_lo"))
          .agg(
            sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
            sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val")),
        Seq("bin_lo"),
        "left")
      .na.fill(0L, Seq("n_train", "n_val"))
    val w  = Window.partitionBy()
    val pT = (col("n_train") + lit(0.5)) / (col("tot_train") + lit(0.5 * nBins))
    val pV = (col("n_val") + lit(0.5)) / (col("tot_val") + lit(0.5 * nBins))
    binned
      .withColumn("tot_train", sum(col("n_train")).over(w))
      .withColumn("tot_val", sum(col("n_val")).over(w))
      .withColumn("pct_train", Det.detRound(pT, 6))
      .withColumn("pct_val", Det.detRound(pV, 6))
      // per-bin PSI rounded FIRST, then summed as exact DECIMAL — the
      // total is independent of the window's row visit order on both
      // engines (a raw double window-sum would not be)
      .withColumn("psi_bin", Det.detRound((pT - pV) * log(pT / pV), 6))
      .withColumn(
        "psi_total",
        sum(col("psi_bin").cast("decimal(18,6)")).over(w).cast("double"))
      .withColumn(
        "verdict",
        when(col("psi_total") > 0.2, lit("drift"))
          .when(col("psi_total") > 0.1, lit("warn"))
          .otherwise(lit("stable")))
      .select(
        col("bin_lo"), col("n_train"), col("n_val"),
        col("pct_train"), col("pct_val"), col("psi_bin"),
        col("psi_total"), col("verdict"))
      .orderBy(col("bin_lo"))
  }

  private val splitDriftPsiSql = {
    // fully parenthesized: these interpolate into `$pT / $pV`, where an
    // unwrapped a / b form would re-associate the division
    val half = PsiBins.size * 0.5
    val pT   = s"((n_train + 0.5) / (tot_train + $half))"
    val pV   = s"((n_val + 0.5) / (tot_val + $half))"
    s"""WITH a AS (
       |  SELECT CASE WHEN ${splitDigitSql} <= 'b'
       |              THEN 'train' ELSE 'val' END AS split,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |  WHERE ${splitDigitSql} <= 'd'
       |), b AS (
       |  SELECT CASE WHEN n_tokens < 50 THEN 0 WHEN n_tokens < 100 THEN 50
       |              WHEN n_tokens < 200 THEN 100 WHEN n_tokens < 400 THEN 200
       |              WHEN n_tokens < 800 THEN 400 ELSE 800 END AS bin_lo,
       |         split
       |  FROM a
       |), g0 AS (
       |  SELECT CAST(bin_lo AS BIGINT) AS bin_lo,
       |         CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |         CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val
       |  FROM b GROUP BY 1
       |), g AS (
       |  SELECT CAST(s.bin_lo AS BIGINT) AS bin_lo,
       |         CAST(COALESCE(g0.n_train, 0) AS BIGINT) AS n_train,
       |         CAST(COALESCE(g0.n_val, 0) AS BIGINT) AS n_val
       |  FROM (VALUES ${PsiBins.map(b => s"($b)").mkString(", ")}) s(bin_lo)
       |  LEFT JOIN g0 ON CAST(s.bin_lo AS BIGINT) = g0.bin_lo
       |), t AS (
       |  SELECT *, SUM(n_train) OVER () AS tot_train, SUM(n_val) OVER () AS tot_val
       |  FROM g
       |), p AS (
       |  SELECT bin_lo, n_train, n_val,
       |         ${Det.roundSql(pT, 6)} AS pct_train,
       |         ${Det.roundSql(pV, 6)} AS pct_val,
       |         ${Det.roundSql(s"($pT - $pV) * ln($pT / $pV)", 6)} AS psi_bin
       |  FROM t
       |), q AS (
       |  SELECT *, CAST(SUM(CAST(psi_bin AS DECIMAL(18,6))) OVER () AS DOUBLE) AS psi_total
       |  FROM p
       |)
       |SELECT bin_lo, n_train, n_val, pct_train, pct_val, psi_bin, psi_total,
       |       CASE WHEN psi_total > 0.2 THEN 'drift'
       |            WHEN psi_total > 0.1 THEN 'warn' ELSE 'stable' END AS verdict
       |FROM q
       |ORDER BY bin_lo""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "split_drift_psi"       -> QueryDef(splitDriftPsi, Some(splitDriftPsiSql)),
    "temporal_split"        -> QueryDef(temporalSplit, Some(temporalSplitSql)),
    "scd2_history"          -> QueryDef(scd2History, Some(scd2HistorySql)),
    "scd2_pit_join"         -> QueryDef(scd2PitJoin, Some(scd2PitJoinSql)),
    "doc_chunks"            -> QueryDef(docChunks, Some(docChunksSql)),
    "chunk_dedup"           -> QueryDef(chunkDedup, Some(chunkDedupSql)),
    "boilerplate_ngrams"    -> QueryDef(boilerplateNgrams, Some(boilerplateNgramsSql)),
    "boilerplate_strip"     -> QueryDef(boilerplateStrip, Some(boilerplateStripSql)),
    "bloom_join_prune"      -> QueryDef(bloomJoinPrune, Some(bloomJoinPruneSql)),
    "incremental_agg_merge" -> QueryDef(incrementalAggMerge, Some(incrementalAggMergeSql)),
    "corpus_shuffle"        -> QueryDef(corpusShuffle, Some(corpusShuffleSql)),
    "dataset_split"         -> QueryDef(datasetSplit, Some(datasetSplitSql)))
}
