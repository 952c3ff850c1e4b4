package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.Ckpt.CutOps
import graft.functions.KmvDistinct
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-vs-exact cardinality accounting (round 2): registers the KMV
  * typed Aggregator as a first-class query next to the exact answer,
  * per event type — the "how wrong is the cheap estimate" query every
  * 100 TB pipeline runs before switching its dashboards to sketches.
  *
  * Exact side is the two-stage distinct (pre-aggregate on the key — no
  * Expand plan); the sketch side is a single-pass partial aggregate
  * whose merge is partition-order-invariant. Because the KMV hash is
  * engine-portable (md5-based, functions.PortableHash), the oracle
  * recomputes the identical estimate as the k-th order statistic of the
  * distinct hashes — a true hash-exact check of the sketch math. The
  * built-in HLL++ (`approx_count_distinct`) remains spec-covered
  * (TextNgramsSketchSpec): its seed is engine-private, so it can never
  * be oracle-compared by design.
  */
object Sketches {

  private val KmvK = 256

  def distinctUsersSketch(spark: SparkSession, dir: String): DataFrame = {
    // "distinct users" excludes anonymous events on both engines: the
    // two-stage groupBy would count the NULL group as a user while
    // DuckDB's COUNT(DISTINCT) skips it (null_sweep-found divergence)
    val ev  = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val kmv = KmvDistinct.udf(KmvK)
    val exact = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_distinct"))
    val sketched = ev
      .groupBy(col("event_type"))
      .agg(kmv(col("user_id")).as("kmv_est"))
    exact
      .join(sketched, "event_type")
      .select(
        col("event_type"),
        col("exact_distinct"),
        Det.detRound(col("kmv_est"), 2).as("kmv_est"),
        Det.detRound(
          abs(col("kmv_est") - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("kmv_rel_err"))
      .orderBy(col("event_type"))
  }

  /** DuckDB twin of distinctUsersSketch: the KMV estimate recomputed
    * from first principles — distinct md5h60 hashes per type, k-th
    * smallest as the order statistic, (k−1)·2^60/h_k (or the exact
    * count when fewer than k distinct hashes exist).
    */
  private val distinctUsersSketchSql = {
    val est =
      s"CAST(${KmvK - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE) / CAST(hk AS DOUBLE)"
    s"""WITH h AS (
       |  SELECT DISTINCT event_type,
       |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM events WHERE user_id IS NOT NULL
       |), ranked AS (
       |  SELECT event_type, h,
       |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h
       |), sk AS (
       |  SELECT event_type,
       |         count(*) AS n_hashes,
       |         max(CASE WHEN rn = $KmvK THEN h END) AS hk
       |  FROM ranked GROUP BY event_type
       |), exact AS (
       |  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
       |  FROM events WHERE user_id IS NOT NULL GROUP BY event_type
       |), est AS (
       |  SELECT e.event_type, e.exact_distinct,
       |         CASE WHEN s.n_hashes < $KmvK THEN CAST(s.n_hashes AS DOUBLE)
       |              ELSE $est END AS kmv_est
       |  FROM exact e JOIN sk s ON e.event_type = s.event_type
       |)
       |SELECT event_type, exact_distinct,
       |       ${Det.roundSql("kmv_est", 2)} AS kmv_est,
       |       ${Det.roundSql("abs(kmv_est - exact_distinct) / exact_distinct", 6)} AS kmv_rel_err
       |FROM est
       |ORDER BY event_type""".stripMargin
  }

  /** Exact frequent-items via the two-pass Misra-Gries recipe: one MG
    * sweep (k counters, derived from n below) produces a candidate set
    * guaranteed to contain every part with frequency ≥ n/(k+1); a second pass counts
    * ONLY the candidates exactly (broadcast semi-join — the fact table
    * never shuffles by part) and applies the support threshold
    * n div 15000 > n/(k+1). The output is therefore provably identical
    * to the full groupBy + HAVING the oracle runs, while the first pass
    * moves k counters per partition instead of one count per distinct
    * key — the aggregation-pushdown shape for "find the hot keys in
    * 100 TB" where the distinct-key count itself is shuffle-sized.
    */
  def frequentParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"))
    val n  = li.count()
    val thr = n / 15000
    // exactness condition: any item that can pass the HAVING filter
    // (freq ≥ support = max(thr, 1)) must beat the MG undercount bound
    // n/(k+1). Derive k FROM n so the bound sits at half the support
    // threshold at every input size (a fixed k leaves whole bands of n
    // where the condition fails): k+1 = 2·(n/support + 1) ⇒ n/(k+1) ≤
    // support/2 < support. k is O(1/support-fraction), not O(n), so the
    // sketch stays small at any scale.
    val support = math.max(thr, 1L)
    val k       = math.max(16L, 2L * (n / support + 1L)).toInt
    val mg = graft.functions.FrequentItems.udf(k)
    val cands = li
      .agg(mg(col("l_partkey")).as("cand"))
      .select(explode(col("cand")).as("c"))
      .select(col("c._1").as("l_partkey"))
    li.join(broadcast(cands), "l_partkey")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_items"))
      .filter(col("n_items") >= thr)
      .orderBy(desc("n_items"), asc("l_partkey"))
  }

  private val frequentPartsSql =
    """SELECT l_partkey, count(*) AS n_items
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING count(*) >= (SELECT count(*) // 15000 FROM lineitem)
      |ORDER BY n_items DESC, l_partkey""".stripMargin

  private val KllK  = 256
  private val KllQs = Seq(0.25, 0.5, 0.9)
  /** KLL 99%-confidence rank-error fraction for parameter k — the
    * published bound 2.296/k^0.9 (Karnin-Lang-Liberty / DataSketches).
    */
  private val KllEps = 2.296 / math.pow(KllK.toDouble, 0.9)

  /** Mergeable-quantile accounting: the KLL sketch
    * (functions.KllQuantiles) next to the exact percentile, per event
    * type, with the sketch's rank error CHECKED IN THE QUERY against
    * the published ε bound. Exact `percentile` collects every group
    * value onto one reducer — the one aggregate in the engine that
    * cannot scale to 100 TB groups; the KLL aggregate is O(k·log(n/k))
    * per group with map-side partials, and this query is the evidence
    * it can stand in: each output row carries the exact quantile (the
    * oracle-matched value) and `bound_ok` — whether |rank(sketch
    * estimate) − q·n| ≤ ε·n+1. The sketch state itself is
    * engine-private (merge-tree dependent), so the row carries the
    * bound VERDICT, which DuckDB can assert as a constant — any bound
    * violation flips the hash.
    */
  def valueQuantilesSketch(spark: SparkSession, dir: String): DataFrame = {
    val ev  = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val kll = graft.functions.KllQuantiles.udf(KllK, KllQs)
    val agg = ev.groupBy(col("event_type"))
      .agg(
        kll(col("value")).as("est"),
        expr(s"percentile(value, array(${KllQs.map(q => s"${q}D").mkString(",")}))")
          .as("exact"),
        count(lit(1)).as("n"))
    val perQ = agg
      .select(
        col("event_type"), col("n"), col("exact"),
        posexplode(col("est")).as(Seq("qi", "est_val")))
      .select(
        col("event_type"), col("n"),
        element_at(array(KllQs.map(lit): _*), col("qi") + 1).as("q"),
        col("est_val"),
        element_at(col("exact"), col("qi") + 1).as("exact_val"))
    // exact rank of every estimate in one scan (the estimates frame is
    // rows-per-(type,q) tiny — broadcast side)
    ev.join(broadcast(perQ), "event_type")
      .groupBy(col("event_type"), col("q"), col("n"), col("est_val"), col("exact_val"))
      .agg(sum(when(col("value") <= col("est_val"), 1L).otherwise(0L)).as("rank"))
      .select(
        col("event_type"),
        col("q"),
        Det.detRound(col("exact_val"), 6).as("exact_val"),
        (abs(col("rank") - col("q") * col("n")) <= lit(KllEps) * col("n") + 1.0)
          .as("bound_ok"))
      .orderBy(col("event_type"), col("q"))
  }

  private val valueQuantilesSketchSql =
    s"""WITH g AS (
       |  SELECT event_type,
       |         quantile_cont(value, 0.25) AS q25,
       |         quantile_cont(value, 0.50) AS q50,
       |         quantile_cont(value, 0.90) AS q90
       |  FROM events GROUP BY event_type
       |)
       |SELECT event_type, CAST(0.25 AS DOUBLE) AS q, ${Det.roundSql("q25", 6)} AS exact_val, TRUE AS bound_ok FROM g
       |UNION ALL
       |SELECT event_type, CAST(0.50 AS DOUBLE), ${Det.roundSql("q50", 6)}, TRUE FROM g
       |UNION ALL
       |SELECT event_type, CAST(0.90 AS DOUBLE), ${Det.roundSql("q90", 6)}, TRUE FROM g
       |ORDER BY event_type, q""".stripMargin

  /** Audience overlap across event segments through the stored-sketch
    * lifecycle: ONE pass over events builds a KMV PARTIAL per
    * event_type (the mergeable array, not the collapsed estimate), then
    * every pairwise union is answered by in-row array merge — sort the
    * concatenation, truncate to k, which reproduces the direct sketch
    * of the union exactly — and the intersection by inclusion-exclusion
    * (|A∩B| ≈ estA + estB − estA∪B, clamped at 0). The exact side
    * (two-stage distinct + user-keyed self-join) rides along as the
    * accounting check. At 100 TB the sketch side is the product — facts
    * are scanned once, |types| arrays of k longs answer all |types|²/2
    * overlap questions — and the exact self-join is the thing it
    * replaces. Hash-exact oracle: same portable md5h60 hashes, same
    * k-th order statistic, same double arithmetic.
    */
  def segmentOverlapSketch(spark: SparkSession, dir: String): DataFrame = {
    val estConst = (KmvK - 1).toDouble * graft.functions.KmvDistinct.HashRange
    def estOf(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(size(arr) < KmvK, size(arr).cast("double"))
        .otherwise(lit(estConst) / element_at(arr, KmvK).cast("double"))
    val ev = Tables.events(spark, dir)
      .filter(col("user_id").isNotNull) // see distinctUsersSketch
      .select(col("event_type"), col("user_id"))
    val sk = ev
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvSketch.udf(KmvK)(col("user_id")).as("sk"))
    // the distinct (type, user) frame feeds three consumers (per-type
    // counts + both sides of the overlap self-join) — checkpoint so the
    // fact scan + distinct shuffle run ONCE (the frame is audience-
    // sized, bounded by |users|·|types|, not fact-sized); same pattern
    // as source_overlap's pinned shingle frame
    val tu = ev.distinct().cutLineage()
    val per = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n_exact"))
    val overlap = tu
      .join(
        tu.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("event_type") < col("type_b"))
      .groupBy(col("event_type").as("type_a"), col("type_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    val a = sk.join(per, "event_type")
      .select(
        col("event_type").as("type_a"), col("sk").as("sk_a"),
        col("n_exact").as("n_a"))
    val b = sk.join(per, "event_type")
      .select(
        col("event_type").as("type_b"), col("sk").as("sk_b"),
        col("n_exact").as("n_b"))
    a.crossJoin(b)
      .filter(col("type_a") < col("type_b"))
      .join(broadcast(overlap), Seq("type_a", "type_b"), "left")
      .withColumn("exact_overlap", coalesce(col("exact_overlap"), lit(0L)))
      .withColumn("merged",
        slice(array_sort(array_distinct(concat(col("sk_a"), col("sk_b")))), 1, KmvK))
      .withColumn("est_union", estOf(col("merged")))
      .withColumn("est_overlap",
        greatest(
          lit(0.0),
          estOf(col("sk_a")) + estOf(col("sk_b")) - col("est_union")))
      .select(
        col("type_a"),
        col("type_b"),
        (col("n_a") + col("n_b") - col("exact_overlap")).as("exact_union"),
        col("exact_overlap"),
        Det.detRound(col("est_union"), 2).as("kmv_union_est"),
        Det.detRound(col("est_overlap"), 2).as("kmv_overlap_est"),
        Det.detRound(
          abs(col("est_overlap") - col("exact_overlap").cast("double")), 2)
          .as("overlap_abs_err"))
      .orderBy(col("type_a"), col("type_b"))
  }

  private val segmentOverlapSketchSql = {
    val estConst =
      s"(CAST(${KmvK - 1} AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE))"
    def est(nh: String, hk: String) =
      s"CASE WHEN $nh < $KmvK THEN CAST($nh AS DOUBLE) ELSE $estConst / CAST($hk AS DOUBLE) END"
    s"""WITH tu AS (
       |  SELECT DISTINCT event_type, user_id FROM events
       |  WHERE user_id IS NOT NULL
       |), per AS (
       |  SELECT event_type, count(*) AS n_exact FROM tu GROUP BY event_type
       |), pairs AS (
       |  SELECT a.event_type AS type_a, a.n_exact AS n_a,
       |         b.event_type AS type_b, b.n_exact AS n_b
       |  FROM per a JOIN per b ON a.event_type < b.event_type
       |), ov AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS exact_overlap
       |  FROM tu a JOIN tu b
       |    ON a.user_id = b.user_id AND a.event_type < b.event_type
       |  GROUP BY 1, 2
       |), h AS (
       |  SELECT DISTINCT event_type,
       |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM events WHERE user_id IS NOT NULL
       |), tr AS (
       |  SELECT event_type, h,
       |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h
       |), tsk AS (
       |  SELECT event_type, count(*) AS n_h,
       |         max(CASE WHEN rn = $KmvK THEN h END) AS hk
       |  FROM tr WHERE rn <= $KmvK GROUP BY event_type
       |), uh AS (
       |  SELECT DISTINCT p.type_a, p.type_b, h.h
       |  FROM pairs p JOIN h ON h.event_type IN (p.type_a, p.type_b)
       |), ur AS (
       |  SELECT type_a, type_b, h,
       |         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
       |  FROM uh
       |), usk AS (
       |  SELECT type_a, type_b, count(*) AS n_h,
       |         max(CASE WHEN rn = $KmvK THEN h END) AS hk
       |  FROM ur WHERE rn <= $KmvK GROUP BY type_a, type_b
       |), est AS (
       |  SELECT p.type_a, p.type_b,
       |         p.n_a + p.n_b - COALESCE(o.exact_overlap, 0) AS exact_union,
       |         COALESCE(o.exact_overlap, 0) AS exact_overlap,
       |         ${est("u.n_h", "u.hk")} AS est_union,
       |         greatest(0.0,
       |           ${est("ta.n_h", "ta.hk")} + ${est("tb.n_h", "tb.hk")}
       |             - ${est("u.n_h", "u.hk")}) AS est_overlap
       |  FROM pairs p
       |  LEFT JOIN ov o ON o.type_a = p.type_a AND o.type_b = p.type_b
       |  JOIN tsk ta ON ta.event_type = p.type_a
       |  JOIN tsk tb ON tb.event_type = p.type_b
       |  JOIN usk u  ON u.type_a = p.type_a AND u.type_b = p.type_b
       |)
       |SELECT type_a, type_b, exact_union, exact_overlap,
       |       ${Det.roundSql("est_union", 2)} AS kmv_union_est,
       |       ${Det.roundSql("est_overlap", 2)} AS kmv_overlap_est,
       |       ${Det.roundSql("abs(est_overlap - CAST(exact_overlap AS DOUBLE))", 2)} AS overlap_abs_err
       |FROM est
       |ORDER BY type_a, type_b""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "segment_overlap_sketch" -> QueryDef(segmentOverlapSketch, Some(segmentOverlapSketchSql)),
    "distinct_users_sketch"  -> QueryDef(distinctUsersSketch, Some(distinctUsersSketchSql)),
    "frequent_parts"         -> QueryDef(frequentParts, Some(frequentPartsSql)),
    "value_quantiles_sketch" -> QueryDef(valueQuantilesSketch, Some(valueQuantilesSketchSql)))
}
