package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def media = Multimodal.mediaTable(Tables.documents(spark, TestSpark.Sf))

  test("media table has binary payload + typed metadata") {
    val schema = media.schema
    assert(schema("content").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    assert(media.count() === Tables.documents(spark, TestSpark.Sf).count())
  }

  test("fake decoder is deterministic and L1-normalized") {
    val bytes = "hello multimodal world".getBytes("UTF-8")
    val f1    = Multimodal.fakeDecode(bytes)
    val f2    = Multimodal.fakeDecode(bytes)
    assert(f1.toSeq === f2.toSeq)
    assert(math.abs(f1.sum - 1.0) < 1e-9)
  }

  test("decodeFeatures preserves rows and emits 16-dim features") {
    val feats = Multimodal.decodeFeatures(media)
    val rows  = feats.collect()
    assert(rows.length === media.count())
    assert(rows.forall(_.features.length === 16))
    assert(rows.forall(r => math.abs(r.features.sum - 1.0) < 1e-9))
  }

  test("frame sampling yields ceil(len/frame)/everyN-ish frames") {
    val sampled = Multimodal.frameSample(media, frameBytes = 64, everyN = 2)
    val perDoc = sampled.groupBy("doc_id").count()
      .join(media.select(col("doc_id"), length(col("content")).as("len")), "doc_id")
      .collect()
    perDoc.foreach { r =>
      val len      = r.getAs[Int]("len")
      val frames   = math.ceil(len.toDouble / 64).toLong
      val expected = (frames + 1) / 2 // every 2nd frame, starting at 0
      assert(r.getAs[Long]("count") === expected,
        s"doc ${r.getAs[Long]("doc_id")}: got ${r.getAs[Long]("count")}, expected $expected")
    }
    // frames are at most frameBytes long
    val maxLen = sampled.select(max(length(col("frame")))).collect().head.getInt(0)
    assert(maxLen <= 64)
  }
}
