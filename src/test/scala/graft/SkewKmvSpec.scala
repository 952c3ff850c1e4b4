package graft

import graft.functions.KmvDistinct
import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewKmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted aggregation is bit-identical to the unsalted plan on skewed data") {
    // 50k rows, 90% on one hot key
    val df = spark.range(50000)
      .select(
        when($"id" % 10 < 9, 1L).otherwise($"id" % 100).as("k"),
        ($"id" % 97).cast("double").as("v"))
      .withColumn("v", $"v".cast(graft.Det.Money))
    val salted = Skew
      .saltedSumCount(df, "k", salt = 16, Seq("v_sum" -> col("v")))
      .orderBy("k")
      .collect()
    val plain = df.groupBy($"k")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("v_sum"))
      .orderBy("k")
      .collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("KMV distinct estimate tracks exact within 15% and is partition-invariant") {
    val kmv = KmvDistinct.udf(256)
    val ids = Tables.events(spark, TestSpark.Sf).select($"event_id")
    val exact = ids.distinct().count().toDouble
    val est1 = ids.agg(kmv($"event_id")).collect().head.getDouble(0)
    val est2 = ids.repartition(17).agg(kmv($"event_id")).collect().head.getDouble(0)
    assert(est1 === est2, "KMV must be deterministic under repartitioning")
    assert(math.abs(est1 - exact) / exact <= 0.15, s"est=$est1 exact=$exact")
  }

  test("KMV returns exact count below k") {
    val kmv = KmvDistinct.udf(64)
    val est = spark.range(20).agg(kmv($"id")).collect().head.getDouble(0)
    assert(est === 20.0)
  }

  test("segment_overlap_sketch: inclusion-exclusion on crafted disjoint/nested/partial segments") {
    // X = users 0..99, Y = 50..149 (|X∩Y| = 50), Z = 200..219 (disjoint)
    val d = java.nio.file.Files.createTempDirectory("graft-segoverlap").toFile
    d.deleteOnExit()
    def seg(t: String, lo: Long, hi: Long) =
      spark.range(lo, hi).select(
        $"id".as("event_id"),
        timestamp_micros(lit(1704067200000000L) + $"id").as("ts"),
        $"id".as("user_id"),
        lit(t).as("event_type"))
    seg("X", 0, 100).unionAll(seg("Y", 50, 150))
      .unionAll(seg("Z", 200, 220))
      .write.parquet(d.getAbsolutePath + "/events.parquet")
    val rows = graft.operators.Sketches
      .segmentOverlapSketch(spark, d.getAbsolutePath)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(t => (t._1, t._2)).toSeq === Seq(("X", "Y"), ("X", "Z"), ("Y", "Z")))
    val byPair = rows.map(t => (t._1, t._2) -> t).toMap
    // all sets are below k=256, so every estimate is EXACT
    val xy = byPair(("X", "Y"))
    assert((xy._3, xy._4) === (150L, 50L))
    assert(xy._5 === 150.0 && xy._6 === 50.0, s"XY estimates not exact: $xy")
    val xz = byPair(("X", "Z"))
    assert((xz._3, xz._4) === (120L, 0L))
    assert(xz._5 === 120.0 && xz._6 === 0.0, s"XZ estimates not exact: $xz")
    val yz = byPair(("Y", "Z"))
    assert((yz._3, yz._4) === (120L, 0L))
  }
}
