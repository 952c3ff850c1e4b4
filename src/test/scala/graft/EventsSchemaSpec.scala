package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary: the driver regenerates /root/testdata and has
  * already shipped `events.ts` under two different physical encodings
  * (INT64 TIMESTAMP(NANOS) through round 5, timestamp[us] from round 6).
  * Tables.events is the single normalization boundary — this spec pins its
  * contract (ts = epoch-µs BIGINT) for every known encoding, so the next
  * regeneration fails HERE with a named assertion instead of surfacing as
  * dozens of opaque analysis errors downstream.
  */
class EventsSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 2024-01-01T00:00:00.123456Z
  private val UsValue = 1704067200123456L

  private def dirWith(writer: String => Unit): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events-schema").toFile
    d.deleteOnExit()
    writer(d.getAbsolutePath + "/events.parquet")
    d.getAbsolutePath
  }

  private def assertNormalized(dir: String, encoding: String): Unit = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === LongType,
      s"$encoding: Tables.events must emit ts as BIGINT epoch-µs, " +
        s"got ${ev.schema("ts").dataType}")
    val got = ev.select(col("ts")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(UsValue), s"$encoding: µs value corrupted")
  }

  test("legacy BIGINT-nanos ts normalizes to epoch-µs") {
    import spark.implicits._
    val dir = dirWith { p =>
      Seq((1L, UsValue * 1000L)).toDF("event_id", "ts").write.parquet(p)
    }
    assertNormalized(dir, "BIGINT nanos")
  }

  test("timestamp[us] (TIMESTAMP_NTZ on read) ts normalizes to epoch-µs") {
    import spark.implicits._
    val dir = dirWith { p =>
      Seq(1L).toDF("event_id")
        .withColumn("ts", timestamp_micros(lit(UsValue)).cast(TimestampNTZType))
        .write.parquet(p)
    }
    assertNormalized(dir, "TIMESTAMP_NTZ")
  }

  test("UTC-adjusted TIMESTAMP ts normalizes to epoch-µs") {
    import spark.implicits._
    val dir = dirWith { p =>
      Seq(1L).toDF("event_id")
        .withColumn("ts", timestamp_micros(lit(UsValue)))
        .write.parquet(p)
    }
    assertNormalized(dir, "TIMESTAMP")
  }

  test("an unknown ts encoding fails loudly at the boundary") {
    import spark.implicits._
    val dir = dirWith { p =>
      Seq((1L, "2024-01-01")).toDF("event_id", "ts").write.parquet(p)
    }
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("eventsBetween pushes the raw-ts range to the scan for BOTH encodings") {
    import spark.implicits._
    val nanosDir = dirWith { p =>
      Seq((1L, (UsValue - 10) * 1000L), (2L, UsValue * 1000L),
        (3L, (UsValue + 10) * 1000L))
        .toDF("event_id", "ts").write.parquet(p)
    }
    val ntzDir = dirWith { p =>
      Seq((1L, UsValue - 10), (2L, UsValue), (3L, UsValue + 10))
        .toDF("event_id", "us")
        .select(
          col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
        .write.parquet(p)
    }
    Seq("nanos" -> nanosDir, "ntz" -> ntzDir).foreach { case (enc, d) =>
      val df = Tables.eventsBetween(spark, d, UsValue, UsValue + 1)
      // half-open window keeps exactly the middle row, normalized to µs
      val rows = df.select(col("event_id"), col("ts")).collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((2L, UsValue)), s"$enc: boundary semantics")
      // and the range predicate reached the parquet reader: a derived-ts
      // filter shows PushedFilters: [] — the 100 TB regression this
      // helper exists to prevent
      val plan = df.queryExecution.executedPlan.toString
      assert(
        plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,") &&
          plan.contains("LessThan(ts,"),
        s"$enc: ts range not pushed to scan:\n$plan")
    }
  }

  test("driver testdata events.ts normalizes end-to-end") {
    val ev = Tables.events(spark, TestSpark.Sf)
    assert(ev.schema("ts").dataType === LongType)
    val r = ev.agg(min(col("ts")), max(col("ts"))).collect().head
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    // plausibility band: 2000-01-01 .. 2100-01-01 in epoch-µs — catches a
    // silently mis-scaled (nanos-read-as-µs or seconds) normalization
    assert(lo > 946684800000000L && hi < 4102444800000000L,
      s"events.ts out of plausible epoch-µs band: [$lo, $hi]")
  }
}
