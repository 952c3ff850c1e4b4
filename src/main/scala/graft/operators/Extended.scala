package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extended analytics beyond the reference's literal surface: snowflake
  * dimension joins, funnel analysis, set operations, and grouping-set
  * rollups — the queries the reference's PDF recommends as future work
  * (§12.2) and that any production deployment of it would add next.
  */
object Extended {

  /** Revenue by region/nation: orders ⋈ customer (both fact-sized →
    * shuffle join on custkey) with nation/region broadcast — the
    * geo_data analytics the reference stores but never aggregates
    * (users.geo_data, data_generator.py:196–205).
    */
  def revenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    // Two-stage exact distinct (same pattern as productPopularity):
    // pre-aggregate per customer, then per nation — no Expand plan.
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), col("o_custkey"))
      .agg(
        sum(col("o_totalprice").cast(Det.Money)).as("rev_dec"),
        count(lit(1)).as("cust_orders"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Det.detRound(sum(col("rev_dec")).cast("double"), 2).as("revenue"),
        sum(col("cust_orders")).as("n_orders"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val revenueByRegionSql =
    s"""SELECT r.r_name, n.n_name,
       |       ${Det.roundSql("CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)", 2)} AS revenue,
       |       count(*) AS n_orders,
       |       count(DISTINCT o.o_custkey) AS n_customers
       |FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY r.r_name, n.n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** Event funnel view → click → purchase: per-user conditional
    * aggregation then one global stage-count row with conversion rates
    * (the "conversion funnel" extension the reference's session
    * conversion_status implies, PDF §12.2).
    */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(perUserStages(Tables.events(spark, dir)))

  /** Per-user stage counts — a MERGEABLE partial (plain sums), so the
    * streaming twin (`stream_funnel`) can fold micro-batches into these
    * rows and re-merge by user at finish with an identical result for
    * any partitioning of the stream.
    */
  private[graft] def perUserStages(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"))

  /** Global funnel row over a per-user stage-count frame. */
  private[graft] def funnelOf(perUser: DataFrame): DataFrame =
    perUser
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("views") > 0, 1L).otherwise(0L)).as("n_viewers"),
        sum(when(col("views") > 0 && col("clicks") > 0, 1L).otherwise(0L)).as("n_clickers"),
        sum(when(col("views") > 0 && col("clicks") > 0 && col("purchases") > 0, 1L)
          .otherwise(0L)).as("n_converters"))
      .select(
        col("n_users"), col("n_viewers"), col("n_clickers"), col("n_converters"),
        Det.detRound(col("n_converters").cast("double") / col("n_viewers"), 6)
          .as("view_to_purchase_rate"))

  private[graft] val conversionFunnelSql =
    s"""WITH per_user AS (
       |  SELECT user_id,
       |         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
       |         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
       |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
       |  FROM events GROUP BY user_id
       |)
       |SELECT count(*) AS n_users,
       |       CAST(SUM(CASE WHEN views > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_viewers,
       |       CAST(SUM(CASE WHEN views > 0 AND clicks > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clickers,
       |       CAST(SUM(CASE WHEN views > 0 AND clicks > 0 AND purchases > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converters,
       |       ${Det.roundSql(
        "CAST(SUM(CASE WHEN views > 0 AND clicks > 0 AND purchases > 0 THEN 1 ELSE 0 END) AS DOUBLE) / SUM(CASE WHEN views > 0 THEN 1 ELSE 0 END)",
        6)} AS view_to_purchase_rate
       |FROM per_user""".stripMargin

  /** Customers who buy but never generated a session event — set
    * difference (EXCEPT ≡ left-anti join) across the two fact tables.
    */
  def customersWithoutSessions(spark: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(spark, dir).select(col("o_custkey").as("user_id")).distinct()
    val active = Tables.events(spark, dir).select(col("user_id")).distinct()
    buyers.except(active).orderBy(col("user_id"))
  }

  private val customersWithoutSessionsSql =
    """SELECT * FROM (
      |  SELECT DISTINCT o_custkey AS user_id FROM orders
      |  EXCEPT
      |  SELECT DISTINCT user_id FROM events
      |) ORDER BY user_id""".stripMargin

  /** Revenue rollup over (brand, returnflag) — grouping-set aggregation
    * with explicit grouping indicators (portable across engines).
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    // Pre-aggregate to exact DECIMAL partials per (l_partkey,
    // l_returnflag) BEFORE the rollup: ROLLUP plans as an Expand that
    // multiplies every input row by (grouping sets), so feeding it the
    // fact table triples the fact-sized aggregation (guide §2.3,
    // aggregate before you shuffle). SUM/COUNT decompose exactly —
    // DECIMAL addition is associative — so rolling up the partials is
    // bit-identical to rolling up the rows. The Expand now runs over a
    // |parts|·|flags|-sized frame at any corpus size.
    val pre = li
      .groupBy(col("l_partkey"), col("l_returnflag"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(Det.Fine))
          .as("rev_dec"),
        count(lit(1)).as("n"))
    pre.join(broadcast(p), pre("l_partkey") === p("p_partkey"), "left")
      .rollup(col("p_brand"), col("l_returnflag"))
      .agg(
        Det.detRound(sum(col("rev_dec")).cast("double"), 2).as("revenue"),
        sum(col("n")).as("n_items"),
        grouping(col("p_brand")).cast("long").as("g_brand"),
        grouping(col("l_returnflag")).cast("long").as("g_flag"))
      .orderBy(
        col("g_brand"), col("g_flag"),
        asc_nulls_last("p_brand"), asc_nulls_last("l_returnflag"))
  }

  private val revenueRollupSql =
    s"""SELECT p.p_brand, l.l_returnflag,
       |       ${Det.roundSql("CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE)", 2)} AS revenue,
       |       count(*) AS n_items,
       |       CAST(GROUPING(p.p_brand) AS BIGINT) AS g_brand,
       |       CAST(GROUPING(l.l_returnflag) AS BIGINT) AS g_flag
       |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
       |GROUP BY ROLLUP(p.p_brand, l.l_returnflag)
       |ORDER BY g_brand, g_flag, p_brand ASC NULLS LAST, l_returnflag ASC NULLS LAST""".stripMargin

  /** Customers having at least one order over 400k — an explicit
    * left-semi join (EXISTS), the join type the reference's funnel
    * recommendation implies (SURVEY.md §2.3 note).
    */
  def bigSpenderCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey"))
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .orderBy(col("c_custkey"))
  }

  private val bigSpenderCustomersSql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Month-over-month revenue growth: lag window over the tiny post-agg
    * monthly frame (PDF §12.2 "revenue trends"). Growth is computed in
    * double from exact decimal monthly sums → cross-engine exact; the
    * first month's growth is NULL in both engines.
    */
  def monthlyRevenueGrowth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables
      .orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        sum(col("o_totalprice").cast(Det.Money)).as("rev_dec"),
        count(lit(1)).as("num_orders"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("month"))
    monthly
      .withColumn("prev_dec", lag(col("rev_dec"), 1).over(w))
      .select(
        col("month"),
        Det.detRound(col("rev_dec").cast("double"), 2).as("revenue"),
        col("num_orders"),
        Det.detRound(
          (col("rev_dec").cast("double") - col("prev_dec").cast("double")) /
            col("prev_dec").cast("double") * 100.0,
          4).as("growth_pct"))
      .orderBy(col("month"))
  }

  private val monthlyRevenueGrowthSql =
    s"""WITH monthly AS (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
       |         count(*) AS num_orders
       |  FROM orders GROUP BY 1
       |), lagged AS (
       |  SELECT month, rev_dec, num_orders,
       |         lag(rev_dec) OVER (ORDER BY month) AS prev_dec
       |  FROM monthly
       |)
       |SELECT month,
       |       ${Det.roundSql("CAST(rev_dec AS DOUBLE)", 2)} AS revenue,
       |       num_orders,
       |       ${Det.roundSql("(CAST(rev_dec AS DOUBLE) - CAST(prev_dec AS DOUBLE)) / CAST(prev_dec AS DOUBLE) * 100.0", 4)} AS growth_pct
       |FROM lagged
       |ORDER BY month""".stripMargin

  /** View→purchase conversion latency: per-user first view / first
    * purchase timestamps (µs), one summary row. Conditional min-aggs +
    * exact decimal mean; median via matching percentile semantics.
    */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables
      .events(spark, dir) // ts already epoch-µs
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .filter(col("first_view").isNotNull && col("first_purchase").isNotNull &&
        col("first_purchase") >= col("first_view"))
      .select(((col("first_purchase") - col("first_view")) / 3600e6).as("hours"))
    perUser.agg(
      count(lit(1)).as("n_converting_users"),
      Det.detRound(
        sum(col("hours").cast(Det.Fine)).cast("double") / count(lit(1)), 4)
        .as("avg_hours_to_convert"),
      Det.detRound(expr("percentile(hours, 0.5)"), 4).as("median_hours_to_convert"))
  }

  private val timeToConvertSql =
    s"""WITH per_user AS (
       |  SELECT user_id,
       |         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
       |         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase
       |  FROM events GROUP BY user_id
       |), conv AS (
       |  SELECT (first_purchase - first_view) / 3600e6 AS hours
       |  FROM per_user
       |  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
       |    AND first_purchase >= first_view
       |)
       |SELECT count(*) AS n_converting_users,
       |       ${Det.roundSql("CAST(SUM(CAST(hours AS DECIMAL(30,10))) AS DOUBLE) / count(*)", 4)} AS avg_hours_to_convert,
       |       ${Det.roundSql("quantile_cont(hours, 0.5)", 4)} AS median_hours_to_convert
       |FROM conv""".stripMargin

  /** Per-type z-score anomaly detection over event values: mean/std
    * from exact DECIMAL power sums (one aggregate — the builtin
    * stddev's double accumulation is partition-order-dependent and
    * could never hash-match), broadcast back over the events for the
    * |v−μ| > 3σ count. Two scans, one tiny broadcast — the standard
    * streaming-ready outlier gate shape. `sqrt` is IEEE
    * correctly-rounded in both engines, so the 3σ threshold compares
    * identical doubles.
    */
  def eventValueOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val stats = ev
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Det.fineSum(col("value")).as("s1"),
        Det.fineSum(col("value") * col("value")).as("s2"))
      .select(
        col("event_type"), col("n"),
        (col("s1") / col("n")).as("mean"),
        sqrt(greatest(
          col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")),
          lit(0.0))).as("std"))
    ev
      .join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_events"),
        Det.detRound(max(col("mean")), 4).as("mean_value"),
        Det.detRound(max(col("std")), 4).as("std_value"),
        sum(when(abs(col("value") - col("mean")) > lit(3.0) * col("std"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_rate",
        Det.detRound(col("n_outliers").cast("double") / col("n_events"), 6))
      .orderBy(col("event_type"))
  }

  private val eventValueOutliersSql =
    s"""WITH st AS (
       |  SELECT event_type, count(*) AS n,
       |         CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS s1,
       |         CAST(SUM(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS s2
       |  FROM events GROUP BY event_type
       |), m AS (
       |  SELECT event_type, n, s1 / n AS mean,
       |         sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0)) AS std
       |  FROM st
       |)
       |SELECT e.event_type,
       |       MAX(m.n) AS n_events,
       |       ${Det.roundSql("MAX(m.mean)", 4)} AS mean_value,
       |       ${Det.roundSql("MAX(m.std)", 4)} AS std_value,
       |       CAST(SUM(CASE WHEN abs(e.value - m.mean) > 3.0 * m.std THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |       ${Det.roundSql(
        "CAST(SUM(CASE WHEN abs(e.value - m.mean) > 3.0 * m.std THEN 1 ELSE 0 END) AS DOUBLE) / MAX(m.n)",
        6)} AS outlier_rate
       |FROM events e JOIN m ON e.event_type = m.event_type
       |GROUP BY e.event_type
       |ORDER BY e.event_type""".stripMargin

  // lazy: entries reference SQL vals declared later in the file; an eager
  // val would capture them as null (object-init order)
  lazy val defs: Map[String, QueryDef] = Map(
    "event_value_outliers"      -> QueryDef(eventValueOutliers, Some(eventValueOutliersSql)),
    "big_spender_customers"     -> QueryDef(bigSpenderCustomers, Some(bigSpenderCustomersSql)),
    "revenue_by_region"         -> QueryDef(revenueByRegion, Some(revenueByRegionSql)),
    "conversion_funnel"         -> QueryDef(conversionFunnel, Some(conversionFunnelSql)),
    "customers_without_sessions" -> QueryDef(customersWithoutSessions, Some(customersWithoutSessionsSql)),
    "revenue_rollup"            -> QueryDef(revenueRollup, Some(revenueRollupSql)),
    "monthly_revenue_growth"    -> QueryDef(monthlyRevenueGrowth, Some(monthlyRevenueGrowthSql)),
    "time_to_convert"           -> QueryDef(timeToConvert, Some(timeToConvertSql)),
    "revenue_pivot"             -> QueryDef(revenuePivot, Some(revenuePivotSql)),
    "nation_revenue_share"      -> QueryDef(nationRevenueShare, Some(nationRevenueShareSql)))

  /** Month × region revenue matrix via pivot with an explicit value
    * list (explicit values keep the output schema static — the only
    * scalable pivot: no extra distinct-values job, deterministic
    * columns). Regions are the 5 TPC-H names.
    */
  private val RegionNames =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  def revenuePivot(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_regionkey"))
    val r = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    val joined = o
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("r_name"),
        col("o_totalprice"))
    joined
      .groupBy(col("month"))
      .pivot("r_name", RegionNames)
      .agg(Det.detRound(Det.moneySum(col("o_totalprice")), 2))
      .na.fill(0.0)
      .orderBy(col("month"))
  }

  private val revenuePivotSql = {
    val cols = RegionNames
      .map { rn =>
        s"""coalesce(${Det.roundSql(
            s"CAST(SUM(CASE WHEN r.r_name = '$rn' THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)",
            2)}, 0.0) AS "$rn""""
      }
      .mkString(",\n       ")
    s"""SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
       |       $cols
       |FROM orders o
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |GROUP BY 1
       |ORDER BY month""".stripMargin
  }

  /** Percent-of-total via window: each nation's share of its region's
    * revenue — partitioned window sum over the small post-agg frame.
    */
  def nationRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val perNation = revenueByRegion(spark, dir)
      .select(col("r_name"), col("n_name"), col("revenue"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))
    perNation
      .withColumn(
        "region_share_pct",
        Det.detRound(
          col("revenue") / sum(col("revenue").cast(Det.Fine)).over(w).cast("double") * 100.0,
          4))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val nationRevenueShareSql =
    s"""WITH per_nation AS (
       |  SELECT r.r_name, n.n_name,
       |         ${Det.roundSql("CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)", 2)} AS revenue
       |  FROM orders o
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |  GROUP BY r.r_name, n.n_name
       |)
       |SELECT r_name, n_name, revenue,
       |       ${Det.roundSql(
          "revenue / CAST(SUM(CAST(revenue AS DECIMAL(30,10))) OVER (PARTITION BY r_name) AS DOUBLE) * 100.0",
          4)} AS region_share_pct
       |FROM per_nation
       |ORDER BY r_name, n_name""".stripMargin
}
