package graft

import graft.functions.MortonCode
import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: measured (not asserted-by-faith) data-skipping
  * evidence. Events are written twice — lexicographically sorted by
  * (user_id, ts) and Z-ordered over (user_id, day) — then per-file
  * min/max ranges are computed the same way parquet row-group pruning
  * would use them. A single-day box must intersect EVERY file of the
  * user-sorted layout (each file spans all days) but only a fraction of
  * the Z-ordered files.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("morton interleave is monotone per dimension and bit-exact") {
    assert(MortonCode.interleave(0L, 0L) === 0L)
    assert(MortonCode.interleave(1L, 0L) === 1L)
    assert(MortonCode.interleave(0L, 1L) === 2L)
    assert(MortonCode.interleave(3L, 5L) === // x=011, y=101 -> y2x2 y1x1 y0x0 = 100111
      java.lang.Long.parseLong("100111", 2))
    // negative keys clamp to 0, never poison the curve
    assert(MortonCode.interleave(-7L, 2L) === MortonCode.interleave(0L, 2L))
  }

  test("z-layout prunes a day-box where the user-sort cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    dir.deleteOnExit()
    val ev = Tables.events(spark, TestSpark.Sf)
      .select(col("user_id"), col("ts").as("tus"))
      .withColumn("day", expr("tus div 86400000000"))
    val nFiles = 16
    val zPath = dir.getAbsolutePath + "/z"
    val lPath = dir.getAbsolutePath + "/lex"
    Bucketing.writeZOrdered(ev, zPath, "user_id", "day", nFiles)
    ev.repartitionByRange(nFiles, col("user_id"), col("tus"))
      .sortWithinPartitions("user_id", "tus")
      .write.mode("overwrite").parquet(lPath)

    def fileRanges(p: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(p)
        .groupBy(input_file_name())
        .agg(min("user_id"), max("user_id"), min("day"), max("day"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val z = fileRanges(zPath)
    val l = fileRanges(lPath)
    assert(z.length > 4 && l.length > 4, "need a multi-file layout to measure")
    val days = ev.select(min("day"), max("day")).collect().head
    val midDay = (days.getLong(0) + days.getLong(1)) / 2
    def hitsDay(rs: Array[(Long, Long, Long, Long)]) =
      rs.count { case (_, _, d0, d1) => d0 <= midDay && midDay <= d1 }
    // user-sorted files each span (nearly) all days: no pruning possible
    assert(hitsDay(l) === l.length,
      s"fixture assumption broken: lex layout pruned a day box (${hitsDay(l)}/${l.length})")
    // z-ordered files are 2-D tiles: a one-day box touches a strict subset
    assert(hitsDay(z) < z.length,
      s"z-layout did not prune the day box (${hitsDay(z)}/${z.length})")
    // and the x-dimension still prunes too (strict subset for a user box)
    val midUser = ev.agg(expr("percentile_approx(user_id, 0.5)")).collect().head.getLong(0)
    val userHits = z.count { case (u0, u1, _, _) => u0 <= midUser && midUser <= u1 }
    assert(userHits < z.length, s"z-layout lost user pruning ($userHits/${z.length})")
  }
}
