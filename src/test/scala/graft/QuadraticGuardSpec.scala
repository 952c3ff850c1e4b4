package graft

import graft.operators.{Dedup, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** The intentionally-quadratic exact anchors must refuse oversized
  * corpora (the registered surface contains no plan that can go
  * cartesian/quadratic at scale); at the shipped caps the test-scale
  * queries still build and run.
  */
class QuadraticGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dedup_jaccard refuses a corpus above the exact-anchor cap") {
    val e = intercept[IllegalStateException] {
      Dedup.dedupJaccardGuarded(spark, TestSpark.Sf, cap = 10)
    }
    assert(e.getMessage.contains("dedup_minhash"))
  }

  test("embedding_neardup refuses a corpus above the all-pairs cap") {
    val e = intercept[IllegalStateException] {
      Similarity.embeddingNeardupGuarded(spark, TestSpark.Sf, cap = 10)
    }
    assert(e.getMessage.contains("embedding_neardup_lsh"))
  }

  test("at the shipped caps the anchors still build plans at test scale") {
    assert(Dedup.dedupJaccard(spark, TestSpark.Sf).columns.nonEmpty)
    assert(Similarity.embeddingNeardup(spark, TestSpark.Sf).columns.nonEmpty)
  }
}
