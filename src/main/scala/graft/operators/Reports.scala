package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S14 parity: the reference writes a human-readable analysis summary
  * (`integrated_summary.txt`, integrated_query_engagement_vs_spend.py:
  * 232–258) from the correlation + segment results. Spark-side: the
  * heavy work stays distributed; only the handful of summary rows are
  * collected for the driver-side text render.
  */
object Reports {

  def integratedSummary(spark: SparkSession, dir: String): String = {
    val corr = Engagement.engagementSpendCorr(spark, dir).collect().head
    val segs = Engagement.segmentCounts(spark, dir).collect()
    val sb   = new StringBuilder
    sb.append("INTEGRATED ANALYTICAL QUERY SUMMARY\n")
    sb.append("Query: Do highly engaged users also become high spenders?\n\n")
    sb.append("Key Metrics:\n")
    sb.append("- Engagement: sessions_count, total_duration_seconds, avg_duration_seconds\n")
    sb.append("- Spend: total_spent, num_orders\n\n")
    sb.append(s"Correlations (buyers only, total_spent > 0, n=${corr.getLong(0)}):\n")
    sb.append(f"- corr(total_spent, sessions_count) = ${corr.getDouble(1)}%.4f%n")
    sb.append(f"- corr(total_spent, total_duration_seconds) = ${corr.getDouble(2)}%.4f%n\n")
    sb.append("Segments (based on 75th percentiles):\n")
    segs.foreach(r => sb.append(s"- ${r.getString(0)}: ${r.getLong(1)}\n"))
    sb.toString
  }

  def writeIntegratedSummary(spark: SparkSession, dir: String, outPath: String): Unit =
    Files.writeString(Paths.get(outPath), integratedSummary(spark, dir))

  // ---------------------------------------------------------------------
  // Chart-ready outputs: the exact frames the reference's plot scripts
  // read (plots_from_spark_outputs.py:81,97,113 — top-10 bar-chart CSVs —
  // and integratedplots_query.py:20–27 — the engagement-vs-spend scatter
  // input). Rendering stays out of the engine (matplotlib is a driver-side
  // concern); the ENGINE's job is the pivoted, ordered, limited frame.
  // ---------------------------------------------------------------------

  /** Top-10 categories by revenue, chart column names
    * (plots_from_spark_outputs.py:84 reads category_id/revenue).
    */
  def chartRevenueByCategory(spark: SparkSession, dir: String): DataFrame =
    Commerce.revenueByCategory(spark, dir)
      .select(col("p_brand").as("category_id"), col("revenue"))
      .limit(10)

  private val chartRevenueByCategorySql =
    s"""SELECT p.p_brand AS category_id,
       |       ${Det.roundSql("CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(30,10))) AS DOUBLE)", 2)} AS revenue
       |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
       |GROUP BY p.p_brand
       |ORDER BY revenue DESC NULLS LAST, category_id ASC NULLS FIRST
       |LIMIT 10""".stripMargin

  /** Top-10 spenders, chart column names
    * (plots_from_spark_outputs.py:100 reads user_id/total_spent).
    */
  def chartTopSpenders(spark: SparkSession, dir: String): DataFrame =
    Commerce.topSpenders(spark, dir)
      .select(col("o_custkey").as("user_id"), col("total_spent"))

  private val chartTopSpendersSql =
    s"""SELECT o_custkey AS user_id,
       |       ${Det.roundSql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)", 2)} AS total_spent
       |FROM orders
       |GROUP BY o_custkey
       |ORDER BY total_spent DESC, user_id
       |LIMIT 10""".stripMargin

  /** Top-10 co-purchase pairs with the reference's rendered "x + y" pair
    * label (plots_from_spark_outputs.py:113–115). Built from pairCounts
    * directly — a limit(10) over the top-50 query would not be
    * order-stable through a second CollectLimit.
    */
  def chartAlsoBoughtPairs(spark: SparkSession, dir: String): DataFrame =
    Commerce
      .pairCounts(
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")))
      .orderBy(desc("pair_count"), asc("part_x"), asc("part_y"))
      .limit(10)
      .select(
        concat_ws(" + ", col("part_x"), col("part_y")).as("pair"),
        col("pair_count").as("co_purchase_count"))

  private val chartAlsoBoughtPairsSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      |), pc AS (
      |  SELECT a.l_partkey AS part_x, b.l_partkey AS part_y, count(*) AS pair_count
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |)
      |SELECT CAST(part_x AS VARCHAR) || ' + ' || CAST(part_y AS VARCHAR) AS pair,
      |       pair_count AS co_purchase_count
      |FROM pc
      |ORDER BY pair_count DESC, part_x, part_y
      |LIMIT 10""".stripMargin

  /** Scatter input for the integrated plot: buyers only, engagement vs
    * spend (integratedplots_query.py:20 filters total_spent > 0).
    */
  def chartEngagementScatter(spark: SparkSession, dir: String): DataFrame =
    Engagement.engagementVsSpend(spark, dir)
      .filter(col("total_spent") > 0)
      .select(col("user_id"), col("sessions_count"), col("total_spent"))
      .orderBy(col("user_id"))

  val defs: Map[String, QueryDef] = Map(
    "chart_revenue_by_category" ->
      QueryDef(chartRevenueByCategory, Some(chartRevenueByCategorySql)),
    "chart_top_spenders" ->
      QueryDef(chartTopSpenders, Some(chartTopSpendersSql)),
    "chart_also_bought_pairs" ->
      QueryDef(chartAlsoBoughtPairs, Some(chartAlsoBoughtPairsSql)),
    "chart_engagement_scatter" ->
      QueryDef(
        chartEngagementScatter,
        Some(
          s"""SELECT user_id, sessions_count, total_spent
             |FROM (${Engagement.defs("engagement_vs_spend").oracle.get})
             |WHERE total_spent > 0
             |ORDER BY user_id""".stripMargin)))

  /** Single-file chart CSVs (S11 sink form): one header-bearing CSV per
    * plot family, the drop-in inputs for the reference's plot scripts.
    */
  def writeChartCsvs(spark: SparkSession, dir: String, outDir: String): Unit =
    // driven by defs so a chart query added to the registry can never be
    // silently missing from the CSV sink layer
    defs.toSeq.sortBy(_._1).foreach { case (n, d) =>
      d.build(spark, dir)
        .coalesce(1)
        .write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/$n")
    }

  // ---------------------------------------------------------------------
  // Rendered figures: the reference's figure family as deterministic SVG
  // (the report ships images, not just chart CSVs — PDF figures 2–8;
  // plots_from_spark_outputs.py:81-125, integratedplots_query.py:19-44).
  // Every figure renders from a BOUNDED chart frame (top-k / segments /
  // the buyers scatter), so the collect is report-sink-sized by
  // construction at any corpus scale.
  // ---------------------------------------------------------------------

  /** The seven figures: name → (title, builder). Bar data is (label,
    * value) in the frame's already-sorted order; the scatter is the
    * integrated engagement-vs-spend cloud.
    */
  def renderFigures(spark: SparkSession, dir: String, outDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    // one collect per ordered chart frame; top-5 variants are take(5)
    // of the already-ordered rows (a second limit() on a limited frame
    // would not be order-stable — the chartAlsoBoughtPairs lesson)
    def barData(df: DataFrame): Seq[(String, Double)] =
      df.collect().toSeq.map { r =>
        (Option(r.get(0)).map(_.toString).getOrElse("<null>"), r.getDouble(1))
      }
    val cat = barData(chartRevenueByCategory(spark, dir))
    val sp = barData(
      chartTopSpenders(spark, dir)
        .select(col("user_id").cast("string"), col("total_spent")))
    val figs: Seq[(String, String)] = Seq(
      "01_revenue_by_category_top10" ->
        SvgCharts.barChart(
          "Top 10 Categories by Revenue", "category_id", "revenue", cat, 20),
      "02_top_spenders_top10" ->
        SvgCharts.barChart(
          "Top 10 Users by Total Spent", "user_id", "total_spent", sp, 18),
      "03_also_bought_pairs_top10" ->
        SvgCharts.barChart(
          "Top 10 Products Bought Together (Pairs)", "pair", "co_purchase_count",
          barData(chartAlsoBoughtPairs(spark, dir)
            .select(col("pair"), col("co_purchase_count").cast("double"))),
          22),
      "04_engagement_vs_spend" ->
        SvgCharts.scatter(
          "User Engagement vs Spending",
          "Number of Sessions (Engagement)",
          "Total Spent",
          chartEngagementScatter(spark, dir).collect().toSeq
            .map(r => (r.getLong(1).toDouble, r.getDouble(2)))),
      // the PDF's top-5 terminal figures (Figure 2/3) as charts
      "05_top5_categories" ->
        SvgCharts.barChart(
          "Top 5 Categories by Revenue", "category_id", "revenue", cat.take(5), 20),
      "06_top5_spenders" ->
        SvgCharts.barChart(
          "Top 5 Customers by Total Spending", "user_id", "total_spent",
          sp.take(5), 18),
      // the integrated summary's segment distribution (PDF §10.3)
      "07_segment_counts" ->
        SvgCharts.barChart(
          "User Segments (75th-percentile split)", "segment", "n_users",
          barData(Engagement.segmentCounts(spark, dir)
            .select(col("segment"), col("n_users").cast("double"))),
          24))
    figs.map { case (name, svg) =>
      val p = Paths.get(outDir, s"$name.svg")
      Files.writeString(p, svg)
      p.toString
    }
  }

  /** One-shot chart-report run artifact: every chart CSV plus a run
    * manifest (`_chart_report.json` — per-chart row counts and the
    * relative CSV path) under a single directory, so a consumer gets an
    * atomic "this run produced these charts with these cardinalities"
    * record instead of four unconnected sink dirs. Returns the manifest
    * path.
    */
  def chartReport(spark: SparkSession, dir: String, outDir: String): String = {
    writeChartCsvs(spark, dir, outDir)
    val entries = defs.toSeq.sortBy(_._1).map { case (n, _) =>
      val csv = Option(new java.io.File(s"$outDir/$n").listFiles())
        .getOrElse(Array.empty)
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
        .map(f => s"$n/${f.getName}")
        .getOrElse(sys.error(s"chart $n produced no CSV part file"))
      val rows = Files.readAllLines(Paths.get(s"$outDir/$csv")).size - 1 // header
      s"""{"chart":"$n","csv":"$csv","rows":$rows}"""
    }
    val manifest = Paths.get(outDir, "_chart_report.json")
    Files.writeString(
      manifest,
      entries.mkString("{\"charts\":[", ",", "]}"))
    manifest.toString
  }
}
