package graft

import graft.operators.Reports
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ReportsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("integrated summary renders correlations and all segments (S14)") {
    val tmp = Files.createTempFile("graft-summary", ".txt")
    tmp.toFile.deleteOnExit()
    Reports.writeIntegratedSummary(spark, TestSpark.Sf, tmp.toString)
    val text = Files.readString(tmp)
    assert(text.contains("corr(total_spent, sessions_count)"))
    assert(text.contains("Segments"))
    // every segment line carries a count
    assert(text.linesIterator.count(_.startsWith("- ")) >= 4)
  }

  test("chart_report emits one run artifact: all CSVs plus a manifest with true row counts") {
    val out = Files.createTempDirectory("graft-chart-report").toFile
    out.deleteOnExit()
    val manifestPath = Reports.chartReport(spark, TestSpark.Sf, out.getAbsolutePath)
    val manifest = Files.readString(java.nio.file.Paths.get(manifestPath))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(manifest)
    val charts = node.get("charts")
    assert(charts.size() === Reports.defs.size, "manifest must list every chart family")
    (0 until charts.size()).foreach { i =>
      val e = charts.get(i)
      val csv = new java.io.File(out, e.get("csv").asText())
      assert(csv.isFile, s"manifest points at missing csv: ${e.get("csv")}")
      assert(Files.readAllLines(csv.toPath).size - 1 === e.get("rows").asInt(),
        s"${e.get("chart")} manifest row count diverges from the file")
    }
  }

  test("chart CSVs are single header-bearing files with the reference's columns") {
    val out = Files.createTempDirectory("graft-charts").toFile
    out.deleteOnExit()
    Reports.writeChartCsvs(spark, TestSpark.Sf, out.getAbsolutePath)
    val expected = Map(
      "chart_revenue_by_category" -> "category_id,revenue",
      "chart_top_spenders"        -> "user_id,total_spent",
      "chart_also_bought_pairs"   -> "pair,co_purchase_count",
      "chart_engagement_scatter"  -> "user_id,sessions_count,total_spent")
    expected.foreach { case (name, header) =>
      val files = new java.io.File(out, name)
        .listFiles().filter(_.getName.endsWith(".csv"))
      assert(files.length === 1, s"$name must be a SINGLE csv file")
      val lines = Files.readAllLines(files.head.toPath)
      assert(lines.get(0) === header, s"$name header")
      assert(lines.size > 1, s"$name must carry data rows")
    }
    // top-10 families are capped at 10 data rows like the reference plots
    Seq("chart_revenue_by_category", "chart_top_spenders", "chart_also_bought_pairs")
      .foreach { name =>
        val f = new java.io.File(out, name)
          .listFiles().filter(_.getName.endsWith(".csv")).head
        assert(Files.readAllLines(f.toPath).size <= 11, s"$name rows > 10")
      }
  }

  test("renderFigures emits the reference's 7-figure family as deterministic SVG") {
    val out = Files.createTempDirectory("graft-figs").toFile
    out.deleteOnExit()
    val paths = Reports.renderFigures(spark, TestSpark.Sf, out.getAbsolutePath)
    assert(paths.size === 7)
    val byName = paths.map(p => new java.io.File(p).getName -> Files.readString(
      java.nio.file.Paths.get(p))).toMap
    // structure + labels per figure (the reference's titles and axes)
    val barFigs = Map(
      "01_revenue_by_category_top10.svg" ->
        ("Top 10 Categories by Revenue", "category_id", "revenue", 10),
      "02_top_spenders_top10.svg" ->
        ("Top 10 Users by Total Spent", "user_id", "total_spent", 10),
      "03_also_bought_pairs_top10.svg" ->
        ("Top 10 Products Bought Together (Pairs)", "pair", "co_purchase_count", 10),
      "05_top5_categories.svg" ->
        ("Top 5 Categories by Revenue", "category_id", "revenue", 5),
      "06_top5_spenders.svg" ->
        ("Top 5 Customers by Total Spending", "user_id", "total_spent", 5),
      "07_segment_counts.svg" ->
        ("User Segments (75th-percentile split)", "segment", "n_users", 4))
    barFigs.foreach { case (f, (title, x, y, nBars)) =>
      val svg = byName(f)
      assert(svg.startsWith("<svg "), s"$f must be an SVG document")
      assert(svg.contains(title) && svg.contains(s">$x<") && svg.contains(s">$y<"),
        s"$f missing title or axis labels")
      assert("class=\"bar\"".r.findAllIn(svg).size === nBars,
        s"$f must draw exactly $nBars bars")
      // every bar carries a value label: at least nBars formatted texts
      assert("<text".r.findAllIn(svg).size >= nBars + 2,
        s"$f missing value/tick labels")
    }
    val scatterSvg = byName("04_engagement_vs_spend.svg")
    val nPts = operators.Reports.defs("chart_engagement_scatter")
      .build(spark, TestSpark.Sf).count().toInt
    assert(scatterSvg.contains("User Engagement vs Spending"))
    assert(scatterSvg.contains("Number of Sessions (Engagement)"))
    assert("class=\"pt\"".r.findAllIn(scatterSvg).size === nPts,
      "scatter must draw one point per buyer row")
    // byte-determinism: a second render is identical
    val out2 = Files.createTempDirectory("graft-figs2").toFile
    out2.deleteOnExit()
    Reports.renderFigures(spark, TestSpark.Sf, out2.getAbsolutePath).foreach { p =>
      val name = new java.io.File(p).getName
      assert(Files.readString(java.nio.file.Paths.get(p)) === byName(name),
        s"$name render is not deterministic")
    }
  }

  test("sanitize strips control characters and trims (P15)") {
    import spark.implicits._
    // the reference's rowkey sanitizer: strip \n/\r, trim
    val got = Seq("  a\nb\rc  ", "clean")
      .toDF("s")
      .select(trim(regexp_replace($"s", "[\\n\\r]", "")).as("s"))
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("abc", "clean"))
  }

  test("approx_count_distinct tracks exact within 5% (A5 scale form)") {
    val e = Tables.events(spark, TestSpark.Sf)
    val r = e.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx"))
      .collect().head
    val exact = r.getLong(0).toDouble
    assert(math.abs(r.getLong(1) - exact) / exact <= 0.05)
  }
}
