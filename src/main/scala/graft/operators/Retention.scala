package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.Ckpt.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-lifecycle analytics (round 2): cohort retention triangles and
  * inter-order gap statistics — the "customer lifetime" queries the
  * reference's PDF recommends as future work (§12.2 RFM / trend analysis)
  * expressed as windowed event-sequence analysis over `orders`.
  *
  * Scale notes:
  *  - cohort join is custkey↔custkey between two frames that are BOTH
  *    outputs of a groupBy on custkey — AQE reuses the same hash
  *    partitioning, so the join adds no extra shuffle of the fact table.
  *  - the gap window partitions by customer (thousands of small
  *    partitions, no single-partition cliff) and carries a total-order
  *    tie-breaker so lag() is deterministic under any parallelism.
  */
object Retention {

  /** Month index (year*12 + month - 1) — integer month arithmetic that is
    * identical in Spark and DuckDB, avoiding interval/months_between
    * semantics differences.
    */
  private def ymIdx(dateCol: String) =
    (year(col(dateCol)) * 12 + month(col(dateCol)) - 1).as("ym")

  /** Classic retention triangle: customers grouped by first-order month
    * (cohort), counted in each subsequent month they ordered again.
    * Output: cohort month label, month offset (0 = acquisition month),
    * active-customer count.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(col("o_custkey"), ymIdx("o_orderdate"))
    val firsts = o.groupBy(col("o_custkey")).agg(min(col("ym")).as("cohort_ym"))
    val active = o.distinct()
    active
      .join(firsts, "o_custkey")
      .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("month_offset"))
      .agg(count(lit(1)).as("n_active"))
      .select(
        format_string(
          "%04d-%02d",
          (col("cohort_ym") / 12).cast("int"),
          (col("cohort_ym") % 12 + 1).cast("int")).as("cohort_month"),
        col("month_offset"),
        col("n_active"))
      .orderBy(col("cohort_month"), col("month_offset"))
  }

  private val cohortRetentionSql =
    """WITH o AS (
      |  SELECT o_custkey, year(o_orderdate)*12 + month(o_orderdate) - 1 AS ym
      |  FROM orders
      |), firsts AS (
      |  SELECT o_custkey, min(ym) AS cohort_ym FROM o GROUP BY o_custkey
      |), active AS (
      |  SELECT DISTINCT o_custkey, ym FROM o
      |)
      |SELECT printf('%04d-%02d', CAST(cohort_ym // 12 AS INT), CAST(cohort_ym % 12 + 1 AS INT)) AS cohort_month,
      |       ym - cohort_ym AS month_offset,
      |       count(*) AS n_active
      |FROM active JOIN firsts USING (o_custkey)
      |GROUP BY cohort_ym, ym - cohort_ym
      |ORDER BY cohort_month, month_offset""".stripMargin

  /** Global statistics over per-customer inter-order gaps: lag() per
    * customer (ordered by date with orderkey tie-break), then one exact
    * aggregate row — count, mean (exact integer sum / count), exact
    * linear-interpolation median and p90 (Spark `percentile` ≡ DuckDB
    * `quantile_cont`).
    */
  def orderGapStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
      .agg(
        count(lit(1)).as("n_gaps"),
        Det.detRound(sum(col("gap")).cast("double") / count(lit(1)), 6).as("avg_gap_days"),
        expr("percentile(gap, 0.5)").as("median_gap_days"),
        expr("percentile(gap, 0.9)").as("p90_gap_days"))
  }

  private val orderGapStatsSql =
    s"""WITH seq AS (
       |  SELECT o_custkey, o_orderdate,
       |         lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
       |  FROM orders
       |), gaps AS (
       |  SELECT date_diff('day', prev, o_orderdate) AS gap FROM seq WHERE prev IS NOT NULL
       |)
       |SELECT count(*) AS n_gaps,
       |       ${Det.roundSql("CAST(SUM(gap) AS DOUBLE) / count(*)", 6)} AS avg_gap_days,
       |       quantile_cont(gap, 0.5) AS median_gap_days,
       |       quantile_cont(gap, 0.9) AS p90_gap_days
       |FROM gaps""".stripMargin

  /** First vs latest order per customer — first_value/last_value over a
    * full-partition frame (the remaining window-frame shape the engine
    * had not yet registered), plus basket growth between them. Top 100
    * by growth for a bounded output.
    */
  def customerOrderSpan(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        first_value(col("o_totalprice")).over(w).as("first_price"),
        last_value(col("o_totalprice")).over(w).as("last_price"),
        count(lit(1)).over(w).as("n_orders"))
      .distinct()
      .filter(col("n_orders") >= 2)
      .withColumn(
        "growth",
        Det.detRound(col("last_price") - col("first_price"), 2))
      .orderBy(desc("growth"), asc("o_custkey"))
      .limit(100)
      .select(col("o_custkey"), col("first_price"), col("last_price"),
        col("n_orders"), col("growth"))
  }

  private val customerOrderSpanSql =
    s"""WITH spans AS (
       |  SELECT DISTINCT o_custkey,
       |         first_value(o_totalprice) OVER w AS first_price,
       |         last_value(o_totalprice) OVER w AS last_price,
       |         count(*) OVER w AS n_orders
       |  FROM orders
       |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |)
       |SELECT o_custkey, first_price, last_price, n_orders,
       |       ${Det.roundSql("last_price - first_price", 2)} AS growth
       |FROM spans
       |WHERE n_orders >= 2
       |ORDER BY growth DESC, o_custkey
       |LIMIT 100""".stripMargin

  /** Rolling 7-day active users per day (WAU) next to same-day actives
    * (DAU) and the DAU/WAU stickiness ratio — the standard
    * product-analytics rolling-distinct series. Exact form: each
    * distinct (day, user) contributes itself to the 7 observation days
    * it covers (a bounded ×7 in-row expansion of the DEDUPLICATED
    * day-user pairs, not of raw events), then one distinct-count per
    * observation day. At 100 TB the (day, user) dedup is the big
    * compression (events ≫ day-user pairs); the ×7 expansion rides on
    * the compressed set. The sketch twin for wider windows (28-day MAU
    * over years) is the mergeable HLL in Sketches — this is the exact
    * anchor.
    */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val base = Tables.events(spark, dir)
      .select(expr(s"ts div $DayUs").as("day"), col("user_id"))
      .distinct()
    val bounds = broadcast(base.agg(
      min(col("day")).as("d_min"), max(col("day")).as("d_max")))
    val dau = base.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = base
      .select(explode(expr("sequence(day, day + 6)")).as("day"), col("user_id"))
      .crossJoin(bounds)
      .filter(col("day") <= col("d_max"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau_7d"))
    wau
      .join(dau, Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        col("wau_7d"),
        Det.detRound(
          coalesce(col("dau"), lit(0L)).cast("double") / col("wau_7d"), 6)
          .as("stickiness"))
      .orderBy(col("day"))
  }

  private val rollingActiveUsersSql =
    s"""WITH base AS (
       |  SELECT DISTINCT epoch_us(ts) // 1000000 // 86400 AS day, user_id FROM events
       |), bounds AS (
       |  SELECT MAX(day) AS d_max FROM base
       |), dau AS (
       |  SELECT day, count(DISTINCT user_id) AS dau FROM base GROUP BY day
       |), expanded AS (
       |  SELECT b.day + o.o AS day, b.user_id
       |  FROM base b, unnest(generate_series(0, 6)) AS o(o)
       |), wau AS (
       |  SELECT e.day, count(DISTINCT e.user_id) AS wau_7d
       |  FROM expanded e, bounds
       |  WHERE e.day <= bounds.d_max
       |  GROUP BY e.day
       |)
       |SELECT w.day,
       |       COALESCE(d.dau, 0) AS dau,
       |       w.wau_7d,
       |       ${Det.roundSql("CAST(COALESCE(d.dau, 0) AS DOUBLE) / w.wau_7d", 6)} AS stickiness
       |FROM wau w LEFT JOIN dau d ON w.day = d.day
       |ORDER BY w.day""".stripMargin

  /** Funnel window: steps must complete within 7 days of step 1. */
  private val FunnelWinUs = 7L * 86400L * 1000000L

  /** Ordered-sequence funnel (the windowFunnel operator): how far does
    * each user get through view → click → purchase, where every step
    * must come STRICTLY AFTER the previous one and inside a 7-day window
    * anchored at step 1 — semantics plain conditional aggregation cannot
    * express (step 2's predicate depends on step 1's timestamp). One
    * shuffle total: per-user event pairs are collected in-row and the
    * greedy earliest-transition chain is evaluated by nested
    * higher-order lambdas (array_min over filter), all inside
    * whole-stage codegen — vs the 3-join/3-shuffle dataflow form the
    * oracle runs. Greedy earliest == the chained min, so the two are
    * provably the same function.
    */
  /** Generic N-step funnel depth per user: one row per user with the
    * number of `steps` completed, each step strictly after the previous
    * and within `windowUs` of step 1. Input needs (user_id, us, et).
    * One shuffle (the per-user collect); the greedy chain is N nested
    * lambdas evaluated in-row.
    */
  def funnelDepths(
      events: DataFrame, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty && steps.forall(!_.contains("'")),
      "steps must be non-empty and quote-free")
    val base = events
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("us"), col("et"))).as("evs"))
    val withTs = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val pred =
        if (i == 0) s"e.et = '$step'"
        else s"e.et = '$step' AND e.us > t$i AND e.us <= t1 + ${windowUs}L"
      df.withColumn(
        s"t${i + 1}",
        expr(s"array_min(transform(filter(evs, e -> $pred), e -> e.us))"))
    }
    // forward fold so the DEEPEST satisfied step ends up outermost:
    // when(t_n, n).otherwise(when(t_{n-1}, n-1) ... otherwise(0))
    val depth = steps.indices.foldLeft(lit(0)) { case (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, i + 1).otherwise(acc)
    }
    withTs.select(
      col("user_id"),
      depth.as("depth"),
      col("t1"),
      col(s"t${steps.size}").as("t_last"))
  }

  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .filter(col("user_id").isNotNull) // funnel is user-grain (null_sweep)
      .select(
        col("user_id"),
        col("ts").as("us"),
        col("event_type").as("et"))
    funnelDepths(ev, Seq("view", "click", "purchase"), FunnelWinUs)
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))
  }

  /** DuckDB twin: the same greedy chain as three dependent minimum
    * CTEs (earliest view; earliest qualifying click after it; earliest
    * qualifying purchase after that, all within t1 + window).
    */
  private val windowFunnelSql =
    s"""WITH u AS (
       |  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
       |), s1 AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t1
       |  FROM events WHERE event_type = 'view' GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
       |  FROM events e JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'click'
       |    AND epoch_us(e.ts) > s1.t1 AND epoch_us(e.ts) <= s1.t1 + $FunnelWinUs
       |  GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
       |  FROM events e
       |  JOIN s2 ON e.user_id = s2.user_id
       |  JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'purchase'
       |    AND epoch_us(e.ts) > s2.t2 AND epoch_us(e.ts) <= s1.t1 + $FunnelWinUs
       |  GROUP BY e.user_id
       |), d AS (
       |  SELECT u.user_id,
       |         CASE WHEN s3.user_id IS NOT NULL THEN 3
       |              WHEN s2.user_id IS NOT NULL THEN 2
       |              WHEN s1.user_id IS NOT NULL THEN 1
       |              ELSE 0 END AS depth
       |  FROM u
       |  LEFT JOIN s1 ON u.user_id = s1.user_id
       |  LEFT JOIN s2 ON u.user_id = s2.user_id
       |  LEFT JOIN s3 ON u.user_id = s3.user_id
       |)
       |SELECT depth, count(*) AS n_users
       |FROM d GROUP BY depth ORDER BY depth""".stripMargin

  /** Funnel completion latency: for users who finish the whole
    * view → click → purchase chain, how long the journey takes —
    * count plus exact median / mean / max hours from step 1 to the
    * final step. Rides the same one-shuffle funnelDepths frame (t1 and
    * t_last come out of the in-row chain); the tiny depth-filtered
    * aggregate is the only extra work.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        col("ts").as("us"),
        col("event_type").as("et"))
    // the depth gate is folded into the projection (null = incomplete)
    // instead of a filter: a Filter on the derived column would get the
    // whole nested-lambda chain SUBSTITUTED into its condition by
    // predicate pushdown and then re-evaluated by the project above —
    // measured 5.9 s vs 1.2 s for the same kernel under window_funnel.
    // The null-ignoring aggregates make the two forms equivalent.
    funnelDepths(ev, Seq("view", "click", "purchase"), FunnelWinUs)
      .select(
        when(col("depth") === 3, (col("t_last") - col("t1")) / lit(3600e6))
          .as("hours"))
      .agg(
        count(col("hours")).as("n_completed"),
        Det.detRound(expr("percentile(hours, 0.5)"), 6).as("p50_hours"),
        Det.detRound(avg(col("hours")), 6).as("avg_hours"),
        Det.detRound(max(col("hours")), 6).as("max_hours"))
  }

  private val FlKllK = 256
  // KLL 99%-confidence rank-error fraction, published bound 2.296/k^0.9
  // (Karnin–Lang–Liberty / Apache DataSketches).
  private val FlKllEps = 2.296 / math.pow(FlKllK.toDouble, 0.9)

  /** Scale-routed twin of funnelLatency: the p50 goes through the
    * mergeable KLL Aggregator (functions.KllQuantiles — O(k·log(n/k))
    * state with map-side partials) instead of exact `percentile`,
    * whose single final buffer holding every completed-funnel value is
    * the one piece of funnelLatency that cannot survive 100× user
    * counts. The sketch estimate is engine-private, so the emitted row
    * carries the exact-checkable companions (count / mean / max — all
    * mergeable) plus `bound_ok`: whether the estimate's exact rank is
    * within the published ε·n+1 of 0.5·n. The oracle asserts bound_ok
    * as a constant — a bound violation flips the hash. Same
    * anchor/twin pattern as orders_profile_sketch /
    * value_quantiles_sketch; run THIS form at scale, the exact form
    * stays as the capped anchor.
    */
  def funnelLatencySketch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        col("ts").as("us"),
        col("event_type").as("et"))
    // depth gate as a null-producing projection, not a filter — see
    // funnelLatency for why (lambda-chain duplication under pushdown)
    val hours = funnelDepths(ev, Seq("view", "click", "purchase"), FunnelWinUs)
      .select(
        when(col("depth") === 3, (col("t_last") - col("t1")) / lit(3600e6))
          .as("hours"))
      // materialize: one double per user (input-bounded, far smaller
      // than events) feeds two passes — est + rank; without this the
      // whole funnel shuffle runs twice
      .cutLineage()
      .filter(col("hours").isNotNull) // cheap: runs on materialized rows
    val kll = graft.functions.KllQuantiles.udf(FlKllK, Seq(0.5))
    val est = hours.agg(
      element_at(kll(col("hours")), 1).as("est_val"),
      count(lit(1)).as("n_completed"),
      Det.detRound(avg(col("hours")), 6).as("avg_hours"),
      Det.detRound(max(col("hours")), 6).as("max_hours"))
      // 1-row materialization: est feeds BOTH the rank pass and the
      // final join; without it each consumer re-runs the KLL aggregate,
      // whose merge tree follows shuffle arrival order — two executions
      // could disagree and the self-join on est_val would silently miss
      .cutLineage()
    // exact rank of the single estimate: one more pass over the tiny
    // completed-funnel frame, broadcast-joined (1-row build side)
    val ranks = hours
      .crossJoin(broadcast(est.select(col("est_val").as("ev"))))
      .agg(
        sum(when(col("hours") <= col("ev"), 1L).otherwise(0L)).as("rank"),
        first(col("ev")).as("est_val"))
    est
      .join(broadcast(ranks), Seq("est_val"), "left")
      .select(
        col("n_completed"),
        col("avg_hours"),
        col("max_hours"),
        when(col("n_completed") === 0, lit(true))
          .otherwise(
            abs(col("rank") - lit(0.5) * col("n_completed")) <=
              lit(FlKllEps) * col("n_completed") + 1.0)
          .as("bound_ok"))
  }

  private val funnelLatencySketchSql =
    s"""WITH s1 AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t1
       |  FROM events WHERE event_type = 'view' GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
       |  FROM events e JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'click'
       |    AND epoch_us(e.ts) > s1.t1 AND epoch_us(e.ts) <= s1.t1 + $FunnelWinUs
       |  GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
       |  FROM events e
       |  JOIN s2 ON e.user_id = s2.user_id
       |  JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'purchase'
       |    AND epoch_us(e.ts) > s2.t2 AND epoch_us(e.ts) <= s1.t1 + $FunnelWinUs
       |  GROUP BY e.user_id
       |), h AS (
       |  SELECT (s3.t3 - s1.t1) / 3600e6 AS hours
       |  FROM s3 JOIN s1 ON s3.user_id = s1.user_id
       |)
       |SELECT count(*) AS n_completed,
       |       ${Det.roundSql("avg(hours)", 6)} AS avg_hours,
       |       ${Det.roundSql("max(hours)", 6)} AS max_hours,
       |       TRUE AS bound_ok
       |FROM h""".stripMargin

  private val funnelLatencySql =
    s"""WITH s1 AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t1
       |  FROM events WHERE event_type = 'view' GROUP BY user_id
       |), s2 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
       |  FROM events e JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'click'
       |    AND epoch_us(e.ts) > s1.t1 AND epoch_us(e.ts) <= s1.t1 + $FunnelWinUs
       |  GROUP BY e.user_id
       |), s3 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
       |  FROM events e
       |  JOIN s2 ON e.user_id = s2.user_id
       |  JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'purchase'
       |    AND epoch_us(e.ts) > s2.t2 AND epoch_us(e.ts) <= s1.t1 + $FunnelWinUs
       |  GROUP BY e.user_id
       |), h AS (
       |  SELECT (s3.t3 - s1.t1) / 3600e6 AS hours
       |  FROM s3 JOIN s1 ON s3.user_id = s1.user_id
       |)
       |SELECT count(*) AS n_completed,
       |       ${Det.roundSql("quantile_cont(hours, 0.5)", 6)} AS p50_hours,
       |       ${Det.roundSql("avg(hours)", 6)} AS avg_hours,
       |       ${Det.roundSql("max(hours)", 6)} AS max_hours
       |FROM h""".stripMargin

  /** Per-user event-type transition matrix (first-order Markov path
    * analysis): consecutive event pairs in each user's timeline with
    * counts and the row-conditional probability P(next | prev). One
    * per-user window pass (lag over (ts, event_id) — the id tie-break
    * makes the order total, so both engines see identical successor
    * pairs), then a types²-sized aggregate; the probability window runs
    * on that tiny frame, never on events.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val pairs = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        col("ts").as("us"),
        col("event_id"),
        col("event_type").as("cur"))
      .withColumn("prev", lag(col("cur"), 1).over(byUser))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn(
        "p",
        Det.detRound(
          col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy(col("prev"))), 6))
      .orderBy(col("prev"), col("cur"))
  }

  private val eventTransitionsSql =
    s"""WITH seq AS (
       |  SELECT user_id, event_type AS cur,
       |         lag(event_type) OVER (
       |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
       |  FROM events
       |), pairs AS (
       |  SELECT prev, cur, count(*) AS n
       |  FROM seq WHERE prev IS NOT NULL
       |  GROUP BY prev, cur
       |)
       |SELECT prev, cur, n,
       |       ${Det.roundSql(
        "CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev)", 6)} AS p
       |FROM pairs
       |ORDER BY prev, cur""".stripMargin

  /** Top 20 three-step event-type paths (second-order sequence mining —
    * the step up from eventTransitions' first-order matrix): each user's
    * totally-ordered timeline (ts, event_id tie-break) yields its
    * consecutive type triples via two leads over ONE per-user window
    * pass; the count aggregate runs on a types³-sized frame and the
    * top-k lowers to TakeOrderedAndProject. Per-user partitions bound
    * the window state at any corpus scale (the sessionize discipline) —
    * NULL-user events are excluded on both engines: an anonymous
    * pseudo-user would interleave unrelated activity into fake paths
    * AND concentrate into one giant window partition at 100 TB (the
    * skew hazard temporal_split guards explicitly).
    */
  def eventSequenceTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables
      .events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(
        col("user_id"),
        col("ts").as("us"),
        col("event_id"),
        col("event_type").as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(byUser))
      .withColumn("s3", lead(col("s1"), 2).over(byUser))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("s1"), asc("s2"), asc("s3"))
      .limit(20)
  }

  private val eventSequenceTopkSql =
    s"""WITH seq AS (
       |  SELECT user_id, event_type AS s1,
       |         lead(event_type, 1) OVER (
       |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS s2,
       |         lead(event_type, 2) OVER (
       |           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS s3
       |  FROM events
       |  WHERE user_id IS NOT NULL
       |)
       |SELECT s1, s2, s3, count(*) AS n
       |FROM seq
       |WHERE s2 IS NOT NULL AND s3 IS NOT NULL
       |GROUP BY s1, s2, s3
       |ORDER BY n DESC, s1, s2, s3
       |LIMIT 20""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "event_sequence_topk"  -> QueryDef(eventSequenceTopk, Some(eventSequenceTopkSql)),
    "event_transitions"    -> QueryDef(eventTransitions, Some(eventTransitionsSql)),
    "window_funnel"        -> QueryDef(windowFunnel, Some(windowFunnelSql)),
    "funnel_latency"       -> QueryDef(funnelLatency, Some(funnelLatencySql)),
    "funnel_latency_sketch" -> QueryDef(funnelLatencySketch, Some(funnelLatencySketchSql)),
    "rolling_active_users" -> QueryDef(rollingActiveUsers, Some(rollingActiveUsersSql)),
    "cohort_retention"    -> QueryDef(cohortRetention, Some(cohortRetentionSql)),
    "order_gap_stats"     -> QueryDef(orderGapStats, Some(orderGapStatsSql)),
    "customer_order_span" -> QueryDef(customerOrderSpan, Some(customerOrderSpanSql)))
}
