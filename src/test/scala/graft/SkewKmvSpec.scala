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
}
