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
