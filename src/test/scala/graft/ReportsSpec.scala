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
