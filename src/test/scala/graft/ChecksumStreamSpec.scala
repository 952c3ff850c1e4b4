package graft

import graft.streaming.ChecksumStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incrementally maintained signature must equal the batch checksum
  * of everything ingested — additivity mod 2^61 — and must survive
  * micro-batch replays without double-counting.
  */
class ChecksumStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ser = concat_ws("|",
    col("event_id").cast("string"),
    col("user_id").cast("string"),
    col("event_type"))

  test("merged micro-batches reproduce the batch signature; replays are skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cs").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/sig"
    val ev = Tables.events(spark, TestSpark.Sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
    // three disjoint micro-batches
    val slices = Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2))
    slices.zipWithIndex.foreach { case (b, i) =>
      ChecksumStream.mergeBatch(b, ser, path, i.toLong)
    }
    val s = ChecksumStream.readSig(path)
    val (n, c) = ChecksumStream.batchSig(ev, ser)
    assert(s.nRows === n)
    assert(s.checksum === c)
    // replayed batch (the at-least-once path): signature must not move
    ChecksumStream.mergeBatch(slices(2), ser, path, 2L)
    val s2 = ChecksumStream.readSig(path)
    assert(s2 === s)
    // empty batch advances the guard without changing the signature
    ChecksumStream.mergeBatch(ev.limit(0), ser, path, 3L)
    val s3 = ChecksumStream.readSig(path)
    assert(s3.lastBatch === 3L && s3.nRows === s.nRows && s3.checksum === s.checksum)
  }

  test("real stream maintains the signature across file-source micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-stream").toFile
    dir.deleteOnExit()
    val src  = dir.getAbsolutePath + "/in"
    val path = dir.getAbsolutePath + "/sig"
    val ev = Tables.events(spark, TestSpark.Sf)
      .select(col("event_id"), col("user_id"), col("event_type"))
    ev.filter(col("event_id") % 2 === 0).write.parquet(src + "/a")
    ev.filter(col("event_id") % 2 === 1).write.parquet(src + "/b")
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src + "/*")
    val q = ChecksumStream.maintained(stream, ser, path).start()
    try q.processAllAvailable()
    finally q.stop()
    val s = ChecksumStream.readSig(path)
    val (n, c) = ChecksumStream.batchSig(ev, ser)
    assert(s.nRows === n)
    assert(s.checksum === c)
  }
}
