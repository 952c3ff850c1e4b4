package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir        = TestSpark.Sf

  test("tableProfile reports exact nulls/distincts/bounds on a fixture") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(2L), None),
      (None, Some("c")),
      (Some(2L), Some("a"))).toDF("k", "s")
    val p = Quality.tableProfile(df).collect().map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) === 4L)          // n_rows
    assert(k.getLong(2) === 1L)          // n_nulls
    assert(k.getLong(3) === 2L)          // n_distinct (nulls excluded)
    assert(k.getDouble(4) === 1.0 && k.getDouble(5) === 2.0)
    val s = p("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.getString(6) === "a" && s.getString(7) === "c")
    assert(s.isNullAt(4) && s.isNullAt(5)) // type-split: no numeric bounds
  }

  test("fk audit is clean on the generated schema and counts children") {
    val rows = Quality.fkOrphans(spark, dir).collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getLong(2) === 0L), "generated star schema has no orphans")
    val byRel = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRel("lineitem->orders") === Tables.lineitem(spark, dir).count())
    assert(byRel("orders->customer") === Tables.orders(spark, dir).count())
  }

  test("table_checksum catches a one-row mutation, ignores row order") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cksum").toFile
    tmp.deleteOnExit()
    val d = tmp.getAbsolutePath
    // replica with shuffled row order — checksum must be identical
    Tables.customer(spark, dir).orderBy(rand(7)).coalesce(3)
      .write.parquet(s"$d/customer.parquet")
    Tables.orders(spark, dir).write.parquet(s"$d/orders.parquet")
    Tables.lineitem(spark, dir).write.parquet(s"$d/lineitem.parquet")
    val base = Quality.tableChecksum(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val replica = Quality.tableChecksum(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(base === replica, "row/file order must not affect the signature")
    // corrupt ONE row of one table — only that table's signature moves
    val mut = tmp.toPath.resolve("mut").toFile.getAbsolutePath
    Tables.customer(spark, dir)
      .withColumn("c_name",
        when(col("c_custkey") === 7L, lit("corrupted")).otherwise(col("c_name")))
      .write.parquet(s"$mut/customer.parquet")
    Tables.orders(spark, dir).write.parquet(s"$mut/orders.parquet")
    Tables.lineitem(spark, dir).write.parquet(s"$mut/lineitem.parquet")
    val mutated = Quality.tableChecksum(spark, mut).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mutated("customer")._2 !== base("customer")._2)
    assert(mutated("orders") === base("orders"))
    assert(mutated("lineitem") === base("lineitem"))
  }

  test("key_skew_report: dense ranks, share algebra, skew ratio >= 1") {
    val rows = Quality.keySkewReport(spark, dir).collect()
    assert(rows.nonEmpty)
    rows
      .groupBy(r => (r.getString(0), r.getString(1)))
      .foreach { case ((rel, key), rs) =>
        assert(rs.map(_.getLong(2)).sorted.toSeq === (1L to rs.length),
          s"$rel.$key ranks not dense")
        // rank 1 carries the max group; share and ratio must cohere
        val sorted = rs.sortBy(_.getLong(2))
        assert(sorted.map(_.getLong(4)).toSeq ===
          sorted.map(_.getLong(4)).sortBy(-_).toSeq, s"$rel.$key counts not desc")
        rs.foreach { r =>
          val (cnt, share, nKeys, nRows, ratio) =
            (r.getLong(4), r.getDouble(5), r.getLong(6), r.getLong(7), r.getDouble(8))
          assert(share > 0.0 && share <= 1.0, s"$rel.$key share $share")
          assert(cnt <= nRows && nKeys <= nRows, s"$rel.$key counts incoherent")
          assert(ratio >= 1.0 - 1e-9, s"$rel.$key max/mean ratio $ratio < 1")
        }
      }
  }

  test("snapshot_diff classifies keys consistently with the two states") {
    val d = Quality.snapshotDiff(spark, dir).cache()
    // inserts have no old state; updates strictly grow the order count
    assert(d.filter(col("op") === "insert" && col("n_old") =!= 0L).count() === 0L)
    assert(d.filter(col("op") === "update" && !(col("n_new") > col("n_old"))).count() === 0L)
    // append-only source: deletes impossible
    assert(d.filter(col("op") === "delete").count() === 0L)
    // every diff row carries a real change in spend or count
    assert(d.filter(col("n_new") === col("n_old") && col("delta_spent") === 0.0).count() === 0L)
    d.unpersist()
  }
}
