package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance tier (round 4, batch 2): the operations that keep
  * a 100 TB analytical store CURRENT rather than recomputed — CDC
  * merge-upsert, calendar gap-fill with last-observation-carried-forward,
  * deterministic weighted (PPS) sampling over the distributed prefix sum,
  * and rolling-window distinct counting by merging STORED sketch partials.
  *
  * Scale notes:
  *  - mergeUpsert shuffles the DELTA by key and joins it to the snapshot —
  *    with the snapshot bucketed by the merge key (sources.Bucketing) the
  *    snapshot side never re-shuffles; work is O(delta + touched groups),
  *    the Delta/Iceberg MERGE INTO shape.
  *  - gapFillLocf's spine is |dims| × |days| — calendar-sized, broadcast
  *    against the aggregated facts, never against raw facts.
  *  - sampleWeightedPps is one pass: portable-hash order + the
  *    range-bucketed prefix sum (Rank.withPrefixSum — parallel windows,
  *    no single-partition sort) + an integer crossing test per row. Zero
  *    transcendental math, so the sample is bit-reproducible on any
  *    engine — the property that makes corpus sampling auditable.
  *  - rollingDistinctKmv stores ONE k-array per (day) partial and answers
  *    every window by in-row array merge — the fact table is scanned once
  *    ever; each new day appends one partial. Exact rolling distinct (the
  *    oracle's semantics) would rescan 7 days of raw facts per day.
  */
object Warehouse {

  // ------------------------------------------------------------ merge upsert

  private val MergeCut = "1997-01-01"

  /** CDC MERGE INTO: a per-customer order snapshot (orders before
    * `MergeCut`) merged with the post-cut delta — matched keys update
    * (partials add), unmatched delta keys insert, untouched snapshot keys
    * carry. Count and DECIMAL-sum partials are commutative monoids, so
    * the merged row is bit-identical to the full recompute the oracle
    * runs; `op` makes the three MERGE branches visible in the output.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def partial(f: DataFrame): DataFrame =
      f.groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(Det.Money)).as("v"))
    val snap = partial(orders.filter(col("o_orderdate") < MergeCut))
      .select(col("o_custkey"), col("n").as("n_s"), col("v").as("v_s"))
    val delta = partial(orders.filter(col("o_orderdate") >= MergeCut))
      .select(col("o_custkey"), col("n").as("n_d"), col("v").as("v_d"))
    snap
      .join(delta, Seq("o_custkey"), "full_outer")
      .select(
        col("o_custkey").as("custkey"),
        (coalesce(col("n_s"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n_orders"),
        Det.detRound(
          (coalesce(col("v_s"), lit(0).cast(Det.Money)) +
            coalesce(col("v_d"), lit(0).cast(Det.Money))).cast("double"), 2)
          .as("total_spent"),
        when(col("n_s").isNull, "insert")
          .when(col("n_d").isNull, "carry")
          .otherwise("update")
          .as("op"))
      .orderBy(col("custkey"))
  }

  private val mergeUpsertSql =
    s"""WITH snap AS (
       |  SELECT o_custkey, count(*) AS n,
       |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
       |  FROM orders WHERE o_orderdate < DATE '$MergeCut' GROUP BY o_custkey
       |), delta AS (
       |  SELECT o_custkey, count(*) AS n,
       |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
       |  FROM orders WHERE o_orderdate >= DATE '$MergeCut' GROUP BY o_custkey
       |)
       |SELECT COALESCE(s.o_custkey, d.o_custkey) AS custkey,
       |       COALESCE(s.n, 0) + COALESCE(d.n, 0) AS n_orders,
       |       ${Det.roundSql(
        "CAST(COALESCE(s.v, 0) + COALESCE(d.v, 0) AS DOUBLE)", 2)} AS total_spent,
       |       CASE WHEN s.o_custkey IS NULL THEN 'insert'
       |            WHEN d.o_custkey IS NULL THEN 'carry'
       |            ELSE 'update' END AS op
       |FROM snap s FULL OUTER JOIN delta d ON s.o_custkey = d.o_custkey
       |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------- gap fill / LOCF

  private val GapFrom = "1995-03-01"
  private val GapTo   = "1995-03-31"

  /** Calendar gap-fill with LOCF: per-nation daily order counts over a
    * fixed month, on a dense nation × day spine — missing days appear
    * with n_orders = 0 and the last observed daily revenue carried
    * forward (null until a nation's first observation). The spine is
    * calendar-sized (|nations| × |days|), built independently of the
    * facts and left-joined against the ALREADY-AGGREGATED daily frame —
    * raw orders are touched once, by the aggregation.
    */
  def gapFillLocf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .filter(col("o_orderdate").between(GapFrom, GapTo))
      .join(
        broadcast(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(
        broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").as("day"))
      .agg(
        count(lit(1)).as("n"),
        Det.moneySum(col("o_totalprice")).as("rev"))
    val spine = Tables
      .nation(spark, dir)
      .select(col("n_name"))
      .crossJoin(
        spark.range(1).select(
          explode(expr(s"sequence(DATE'$GapFrom', DATE'$GapTo', interval 1 day)")).as("day")))
    val w = Window
      .partitionBy(col("n_name"))
      .orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(daily, Seq("n_name", "day"), "left")
      .withColumn("rev_locf", last(col("rev"), ignoreNulls = true).over(w))
      .select(
        col("n_name"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        Det.detRound(col("rev_locf"), 2).as("rev_locf"))
      .orderBy(col("n_name"), col("day"))
  }

  private val gapFillLocfSql =
    s"""WITH daily AS (
       |  SELECT n.n_name, o.o_orderdate AS day, count(*) AS n,
       |         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
       |  FROM orders o
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  WHERE o.o_orderdate BETWEEN DATE '$GapFrom' AND DATE '$GapTo'
       |  GROUP BY n.n_name, o.o_orderdate
       |), spine AS (
       |  SELECT n.n_name, d.day
       |  FROM nation n,
       |       (SELECT unnest(generate_series(DATE '$GapFrom', DATE '$GapTo',
       |                                      INTERVAL 1 DAY))::DATE AS day) d
       |)
       |SELECT s.n_name,
       |       strftime(s.day, '%Y-%m-%d') AS day,
       |       COALESCE(dl.n, 0) AS n_orders,
       |       ${Det.roundSql(
        """last_value(dl.rev IGNORE NULLS) OVER (
          |         PARTITION BY s.n_name ORDER BY s.day
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin, 2)} AS rev_locf
       |FROM spine s LEFT JOIN daily dl ON s.n_name = dl.n_name AND s.day = dl.day
       |ORDER BY s.n_name, s.day""".stripMargin

  // ------------------------------------------------------- weighted sampling

  private[graft] val PpsK = 50

  /** Systematic probability-proportional-to-size sampling (the classic
    * PPS design): documents are laid on a line in portable-hash order
    * (content-independent shuffle), each occupying a segment of length =
    * its weight (n_chars); the k sample points at positions
    * total/k · {1..k} pick the documents whose segment they land in.
    * Inclusion probability ∝ weight, sample size exactly k when no
    * weight exceeds the stride; a doc heavier than total/k absorbs
    * several sample points but is emitted once (a certainty unit), so
    * the count can come in UNDER k on a skewed corpus — the standard
    * systematic-PPS semantics, shared by sample_dedup_aware, which
    * inherits this crossing kernel. The crossing test
    * floor(cum·k/total) > floor((cum−w)·k/total) is pure 64-bit integer
    * arithmetic over the range-bucketed distributed prefix sum
    * (Rank.withPrefixSum) — no transcendental math anywhere, so the
    * sample is bit-reproducible across engines (the auditable-sampling
    * property; contrast rand()-based sampling, which can't be replayed).
    */
  def sampleWeightedPps(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val totalRow = docs
      .agg(sum(col("n_chars").cast("long")).as("t"))
      .first() // one scalar to the driver: the line length
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val hashed = docs.select(
      col("doc_id"),
      col("n_chars").cast("long").as("w"),
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
    if (total <= 0L)
      // empty/degenerate corpus: no line to sample from — empty frame
      // with the query's schema (ANSI division by zero never evaluates)
      return hashed
        .withColumn("cum", lit(0L))
        .select(col("doc_id"), col("w"), col("cum"), lit(0L).as("sample_idx"))
        .limit(0)
    // the crossing test must be INTEGER division end to end (`div`, the
    // long integral division — same as the oracle's `//`): a double
    // quotient rounds once total*k passes 2^53 and the two engines'
    // floors can disagree at stride boundaries. Guard the only overflow
    // (cum*k ≤ total*k must fit a long).
    require(total <= Long.MaxValue / PpsK,
      s"corpus weight $total overflows the integer crossing test at k=$PpsK")
    Rank
      .withPrefixSum(hashed, "h", "w")
      .filter(
        expr(s"(cum * $PpsK) div ${total}L") >
          expr(s"((cum - w) * $PpsK) div ${total}L"))
      .select(
        col("doc_id"),
        col("w"),
        col("cum"),
        expr(s"(cum * $PpsK) div ${total}L").as("sample_idx"))
      .orderBy(col("cum"))
  }

  private val sampleWeightedPpsSql =
    s"""WITH h AS (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, w, h,
       |         SUM(w) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM h
       |), t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total FROM documents)
       |SELECT doc_id, w, CAST(cum AS BIGINT) AS cum,
       |       CAST((cum * $PpsK) // total AS BIGINT) AS sample_idx
       |FROM c, t
       |WHERE (cum * $PpsK) // total > ((cum - w) * $PpsK) // total
       |ORDER BY cum""".stripMargin

  // ------------------------------------------------- rolling distinct (KMV)

  private val RollK    = 256
  private val RollDays = 6 // window = day-6 .. day (7 days)

  /** Rolling 7-day distinct users from STORED daily sketch partials: one
    * KMV min-k array per day (functions.KmvSketch), merged in-row across
    * the trailing window — flatten + distinct + sort + truncate
    * reproduces the direct sketch of the 7-day union exactly (min-k
    * merge property), so the estimate is hash-comparable against the
    * oracle's from-scratch recompute. The window is a RANGE frame over
    * day number (missing days can't misalign it), and it runs on the
    * days-sized partial frame — ~30 rows here, |days| at any corpus
    * size — never on raw events. The exact side (the accuracy column)
    * re-expands day×user pairs 7× and is the thing this operator
    * REPLACES at 100 TB; it rides along here as the measured error.
    */
  def rollingDistinctKmv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      // "distinct users" excludes anonymous events (see
      // Sketches.distinctUsersSketch — the same null_sweep divergence)
      .filter(col("user_id").isNotNull)
      .select(
        to_date(timestamp_micros(col("ts"))).as("day"),
        col("user_id"))
    val daily = ev
      .groupBy(col("day"))
      .agg(graft.functions.KmvSketch.udf(RollK)(col("user_id")).as("sk"))
      .withColumn("dn", datediff(col("day"), lit("2024-01-01").cast("date")))
    val w = Window.orderBy(col("dn")).rangeBetween(-RollDays, 0)
    // the global-order window runs on the per-day partials — a frame of
    // |days| rows (30 here), not on events; no fact-sized single
    // partition anywhere
    val sketched = daily
      .withColumn("merged", slice(array_sort(array_distinct(flatten(collect_list(col("sk")).over(w)))), 1, RollK))
      .select(
        col("day"),
        when(size(col("merged")) < RollK, size(col("merged")).cast("double"))
          .otherwise(
            lit((RollK - 1).toDouble * graft.functions.KmvDistinct.HashRange) /
              element_at(col("merged"), RollK).cast("double"))
          .as("kmv_est"))
    val days = ev.select(col("day")).distinct()
    val exact = days
      .join(
        ev.distinct().withColumnRenamed("day", "uday"),
        datediff(col("day"), col("uday")).between(0, RollDays))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    exact
      .join(sketched, "day")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("exact_distinct"),
        Det.detRound(col("kmv_est"), 2).as("kmv_est"),
        Det.detRound(
          abs(col("kmv_est") - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("kmv_rel_err"))
      .orderBy(col("day"))
  }

  private val rollingDistinctKmvSql = {
    val est =
      s"CAST(${RollK - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) / CAST(hk AS DOUBLE)"
    s"""WITH du AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
       |  WHERE user_id IS NOT NULL
       |), days AS (
       |  SELECT DISTINCT day FROM du
       |), win AS (
       |  SELECT d.day, u.user_id
       |  FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
       |), exact AS (
       |  SELECT day, count(DISTINCT user_id) AS exact_distinct FROM win GROUP BY day
       |), wh AS (
       |  SELECT DISTINCT day,
       |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM win
       |), ranked AS (
       |  SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
       |  FROM wh
       |), sk AS (
       |  SELECT day, count(*) AS n_h,
       |         max(CASE WHEN rn = $RollK THEN h END) AS hk
       |  FROM ranked WHERE rn <= $RollK GROUP BY day
       |), est AS (
       |  SELECT e.day, e.exact_distinct,
       |         CASE WHEN s.n_h < $RollK THEN CAST(s.n_h AS DOUBLE)
       |              ELSE $est END AS kmv_est
       |  FROM exact e JOIN sk s ON e.day = s.day
       |)
       |SELECT strftime(day, '%Y-%m-%d') AS day, exact_distinct,
       |       ${Det.roundSql("kmv_est", 2)} AS kmv_est,
       |       ${Det.roundSql("abs(kmv_est - exact_distinct) / exact_distinct", 6)} AS kmv_rel_err
       |FROM est
       |ORDER BY day""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "merge_upsert"         -> QueryDef(mergeUpsert, Some(mergeUpsertSql)),
    "gap_fill_locf"        -> QueryDef(gapFillLocf, Some(gapFillLocfSql)),
    "sample_weighted_pps"  -> QueryDef(sampleWeightedPps, Some(sampleWeightedPpsSql)),
    "rolling_distinct_kmv" -> QueryDef(rollingDistinctKmv, Some(rollingDistinctKmvSql)))
}
