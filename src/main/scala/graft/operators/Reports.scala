package graft.operators

import org.apache.spark.sql.SparkSession
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
}
