package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must survive ZERO-ROW inputs — the shape of a
  * fresh partition, an all-filtered source, or a dry backfill window at
  * 100 TB. Catches the empty-collect / div-by-zero / require-crash
  * class (the round-2 frequentParts sizing bug was exactly this, found
  * only because a probe happened to hit the bad band). Zero output rows
  * is fine; throwing is not.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toFile
    dir.deleteOnExit()
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.foreach { t =>
      Tables.table(spark, TestSpark.Sf, t)
        .limit(0)
        .write.mode("overwrite")
        .parquet(s"${dir.getAbsolutePath}/$t.parquet")
    }
    dir.getAbsolutePath
  }

  test("all registered queries run on zero-row tables without throwing") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, emptyDir).write.mode("overwrite").format("noop").save()
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.length} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
