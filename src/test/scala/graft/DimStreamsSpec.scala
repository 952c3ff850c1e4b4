package graft

import java.nio.file.Files

import graft.operators.Pipeline
import graft.streaming.DimStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming SCD-2 maintenance must reproduce the batch history: replay
  * the order change log in three time-ordered micro-batches and compare
  * every CLOSED version row against `scd2_history`'s closed rows; open
  * versions stay in state and must number one per active key.
  */
class DimStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("replayed change log yields the batch SCD-2 closed history, row for row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dimstream").toFile
    dir.deleteOnExit()

    // the change feed: same projection the batch build starts from
    val feed = Tables.orders(spark, sf).select(
      col("o_custkey").as("custkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("dt"),
      col("o_orderkey").as("orderkey"),
      col("o_orderpriority").as("attr"))

    // three time-ordered slices — micro-batch boundaries respect time
    val cuts = Seq(("1970-01-01", "1994-01-01"), ("1994-01-01", "1996-01-01"),
      ("1996-01-01", "2999-01-01"))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      feed.filter(col("dt") >= lo && col("dt") < hi)
        .coalesce(1).write.parquet(s"${dir.getAbsolutePath}/src/f$i")
    }

    val stream = spark.readStream
      .schema("custkey LONG, dt STRING, orderkey LONG, attr STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath + "/src/f*")
    val q = DimStreams.scd2Stream(stream)
      .writeStream.format("memory").queryName("scd2_closed")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("scd2_closed")
      .select("custkey", "attr", "valid_from", "valid_to")
      .collect().map(_.toSeq).sortBy(_.toString)
    val batch = Pipeline.scd2History(spark, sf)
      .filter(!col("is_current"))
      .select("custkey", "attr", "valid_from", "valid_to")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(batch.nonEmpty, "fixture must produce closed versions")
    assert(streamed.length == batch.length,
      s"closed-version count: streamed ${streamed.length} vs batch ${batch.length}")
    assert(streamed.toSeq == batch.toSeq)

    // open versions: every key with history has exactly one (count check —
    // state itself is engine-internal; batch is_current rows are the truth)
    val openBatch = Pipeline.scd2History(spark, sf).filter(col("is_current")).count()
    val keys = feed.select("custkey").distinct().count()
    assert(openBatch == keys)
  }
}
