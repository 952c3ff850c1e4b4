package graft

import graft.streaming.StreamRunner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared bounded-stream runner protocol: success path materializes
  * before the temp tree is deleted, the empty path falls back, and —
  * the reason the runner exists — a failing handler must not leak its
  * graft-stream-* temp tree (checkpoint + output).
  */
class StreamRunnerSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // fixture source trees, removed in afterAll — a leak-assertion suite
  // must not itself leak its fixtures
  private val fixtureDirs = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

  override def afterAll(): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    fixtureDirs.foreach(rm)
    super.afterAll()
  }

  private def tmpTrees(prefix: String): Set[String] = {
    val root = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(root.listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith(prefix))
      .map(_.getName)
      .toSet
  }

  private def publishSource(rows: Seq[(Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-runner-src")
    fixtureDirs += dir.toFile
    rows.toDF("k", "v").repartition(2, col("k"))
      .write.mode("overwrite").parquet(s"$dir/files")
    s"$dir/files"
  }

  test("success path: batches fold, result materializes, temp tree removed") {
    val src    = publishSource((1L to 20L).map(i => i -> i * 2))
    val before = tmpTrees("graft-runner-ok")
    val out = StreamRunner.runAvailableNow(
      spark,
      schema = Seq((1L, 1L)).toDF("k", "v").schema,
      srcDir = src,
      maxFilesPerTrigger = 1,
      tmpPrefix = "graft-runner-ok",
      mkHandler = outDir =>
        (batch, _) => {
          batch.groupBy(col("k") % 3).agg(sum(col("v")).as("s"))
            .write.mode("append").parquet(outDir); ()
        },
      finish = _.groupBy(col("(k % 3)")).agg(sum(col("s")).cast("long").as("s")),
      empty = spark.emptyDataFrame)
    assert(out.collect().map(r => r.getLong(1)).sum === (1L to 20L).map(_ * 2).sum)
    assert(tmpTrees("graft-runner-ok") === before, "success run leaked its temp tree")
  }

  test("failing handler: exception propagates AND the temp tree is removed") {
    val src    = publishSource(Seq(1L -> 1L, 2L -> 2L))
    val before = tmpTrees("graft-runner-boom")
    val e = intercept[Exception] {
      StreamRunner.runAvailableNow(
        spark,
        schema = Seq((1L, 1L)).toDF("k", "v").schema,
        srcDir = src,
        maxFilesPerTrigger = 1,
        tmpPrefix = "graft-runner-boom",
        mkHandler = _ => (_, _) => throw new IllegalStateException("handler boom"),
        finish = identity,
        empty = spark.emptyDataFrame)
    }
    assert(
      Option(e.getMessage).exists(_.contains("boom")) ||
        Option(e.getCause).exists(c => Option(c.getMessage).exists(_.contains("boom"))),
      s"unexpected failure: $e")
    assert(tmpTrees("graft-runner-boom") === before,
      "failed run leaked its graft-stream temp tree")
  }

  test("empty source: fallback frame returned, temp tree removed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-runner-empty-src")
    fixtureDirs += dir.toFile
    // publish schema-only source dir with zero parquet files
    val srcDir = s"$dir/files"
    new java.io.File(srcDir).mkdirs()
    val before = tmpTrees("graft-runner-empty")
    val out = StreamRunner.runAvailableNow(
      spark,
      schema = Seq((1L, 1L)).toDF("k", "v").schema,
      srcDir = srcDir,
      maxFilesPerTrigger = 1,
      tmpPrefix = "graft-runner-empty",
      mkHandler = outDir => (batch, _) => {
        batch.write.mode("append").parquet(outDir); ()
      },
      finish = identity,
      empty = Seq((0L, 0L)).toDF("k", "v").filter(lit(false)))
    assert(out.collect().isEmpty)
    assert(tmpTrees("graft-runner-empty") === before, "empty run leaked its temp tree")
  }
}
