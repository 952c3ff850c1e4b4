package graft

import graft.sources.ParquetBloom
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet split-block Bloom filters must actually skip row groups for
  * point lookups on a high-cardinality hash column — the case where
  * min/max pruning is provably useless (random values span the domain in
  * every group). Measured from task input metrics, not inferred from
  * wall time.
  */
class ParquetBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val corpus = {
    // hash-keyed lookup table: ~60k rows, random-looking 32-char keys
    Tables
      .lineitem(spark, "/root/testdata/sf0.01")
      .select(
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("key"),
        col("l_orderkey"),
        col("l_extendedprice"))
      .coalesce(1) // one file, many row groups — isolates group skipping
  }

  // per-run temp root: fixed /tmp paths couple the tests to run order
  // and clobber each other across concurrent executors on one host
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft-pqbloom").toFile.getAbsolutePath
  private lazy val bloomDir = {
    val d = s"$root/with"
    ParquetBloom.writeWithBloom(corpus, d, "key", ndv = 60000L)
    d
  }

  test("point-miss lookup reads ~0 rows from bloom files, full groups without") {
    val controlDir = s"$root/without"
    ParquetBloom.writeControl(corpus, controlDir)

    val absent = "0123456789abcdef0123456789abcdef" // not a real md5 of the data
    def lookup(dir: String): Long =
      ParquetBloom.recordsRead(spark) {
        val hits = spark.read.parquet(dir).filter(col("key") === absent).count()
        assert(hits == 0L)
      }

    val without = lookup(controlDir)
    val withB   = lookup(bloomDir)
    val total   = corpus.count()
    // control arm: min/max can't prune random hashes — reads everything
    assert(without >= total, s"control read $without of $total")
    // bloom arm: every row group proves the key absent — reads nothing
    assert(withB == 0L, s"bloom arm still read $withB rows")
  }

  test("present-key lookup still finds its row through the bloom layout") {
    val one = spark.read.parquet(bloomDir).limit(1).collect()(0).getString(0)
    val found = spark.read.parquet(bloomDir).filter(col("key") === one).count()
    assert(found >= 1L)
  }
}
