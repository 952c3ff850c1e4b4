package graft

import graft.operators.Commerce
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink parity with the reference (SURVEY.md §2.1):
  * single-file CSV sink with header (S11, spark_analysis.py:83) and the
  * JSON⇄struct round-trip used for HBase cell payloads (S6/P17,
  * load_hbase_sessions_stream.py:69–70).
  */
class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("coalesce(1) CSV sink round-trips the top-spenders result (S11)") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    dir.deleteOnExit()
    val out = Commerce.topSpenders(spark, TestSpark.Sf)
    out.coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .csv(dir.getAbsolutePath)
    // exactly one part file, as the reference's single-file contract
    val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length === 1)
    val back = spark.read.option("header", "true")
      .schema(out.schema)
      .csv(dir.getAbsolutePath)
      .orderBy(desc("total_spent"), asc("o_custkey"))
    assert(back.collect().toSeq === out.collect().toSeq)
  }

  test("to_json/from_json round-trip preserves nested session payloads (S6/P17)") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("tags", ArrayType(StringType))))
    val df = Seq((1L, 87L, Seq("a", "b")), (2L, 13L, Seq.empty[String]))
      .toDF("id", "k", "tags")
      .select(col("id"), struct(col("k"), col("tags")).as("payload"))
    val roundTripped = df
      .select(col("id"), to_json(col("payload")).as("cell"))
      .select(col("id"), from_json(col("cell"), schema).as("payload"))
    assert(roundTripped.select("id", "payload.k", "payload.tags").collect().toSeq ===
      df.select("id", "payload.k", "payload.tags").collect().toSeq)
  }

  test("events.props parses with an explicit struct schema (P17)") {
    val schema = StructType(Seq(StructField("k", LongType)))
    val parsed = Tables.events(spark, TestSpark.Sf)
      .select(from_json(col("props"), schema).as("p"))
      .select(col("p.k"))
    assert(parsed.filter(col("k").isNull).count() === 0)
  }

  test("ORC sink/source exchange preserves schema, rows, and pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/orders.orc"
    val src = Tables.orders(spark, TestSpark.Sf)
    src.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    // predicate pushdown works on the ORC scan too, not just parquet
    val plan = back.filter(col("o_custkey") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_custkey"),
      s"ORC scan did not push the filter:\n$plan")
    val expected = src.filter(col("o_custkey") === 7L).count()
    assert(back.filter(col("o_custkey") === 7L).count() === expected)
  }
}
