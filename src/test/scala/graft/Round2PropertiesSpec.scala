package graft

import graft.functions.{FrequentItems, KmvDistinct}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator-driven properties for the round-2 kernels,
  * exercised directly (no Spark) so the algebraic guarantees — merge
  * associativity/order-invariance, error bounds — are checked over many
  * random streams and partitionings.
  */
class Round2PropertiesSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val stream: Gen[List[Long]] = for {
    nKeys <- Gen.chooseNum(5, 400)
    n     <- Gen.chooseNum(100, 3000)
    // zipf-ish: low keys much more frequent
    xs <- Gen.listOfN(n, Gen.chooseNum(0.0, 1.0).map(u => ((nKeys * u * u * u).toInt).toLong))
  } yield xs

  test("FrequentItems: MG undercount bound holds on random zipf-ish streams") {
    val k  = 32
    val mg = new FrequentItems(k)
    samples(stream, 60).foreach { xs =>
      val buf = xs.foldLeft(mg.zero)(mg.reduce)
      val est = buf.toMap
      val truth = xs.groupBy(identity).map { case (key, v) => key -> v.length.toLong }
      val bound = xs.length.toDouble / (k + 1)
      truth.foreach { case (key, freq) =>
        val mgCount = est.getOrElse(key, 0L)
        assert(mgCount <= freq, s"MG must never overcount: $key $mgCount > $freq")
        assert(
          mgCount >= freq - bound - 1e-9,
          s"undercount bound violated for $key: freq=$freq mg=$mgCount bound=$bound")
      }
    }
  }

  test("FrequentItems: merge order never violates the bound (3-way splits)") {
    val k  = 32
    val mg = new FrequentItems(k)
    samples(stream, 40).foreach { xs =>
      val parts  = xs.grouped(math.max(1, xs.length / 3)).toList
      val bufs   = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
      val merged = bufs.reduce(mg.merge)
      val truth  = xs.groupBy(identity).map { case (key, v) => key -> v.length.toLong }
      val bound  = xs.length.toDouble / (k + 1)
      truth.foreach { case (key, freq) =>
        val c = merged.getOrElse(key, 0L)
        assert(c <= freq && c >= freq - bound - 1e-9)
      }
    }
  }

  test("KmvDistinct: reduce keeps a sorted distinct k-bounded buffer, merge-equivalent") {
    val k   = 64
    val kmv = new KmvDistinct(k)
    samples(stream, 60).foreach { xs =>
      val buf = xs.foldLeft(kmv.zero)(kmv.reduce)
      assert(buf.length <= k)
      assert(buf.toSeq === buf.toSeq.distinct.sorted, "buffer must stay sorted+distinct")
      // row-by-row reduce must equal a bulk merge of singleton buffers
      val viaMerge = xs
        .map(x => kmv.reduce(kmv.zero, x))
        .foldLeft(kmv.zero)(kmv.merge)
      assert(buf.toSeq === viaMerge.toSeq)
      // estimate invariant under stream order
      val shuffled = new scala.util.Random(3).shuffle(xs)
      val buf2     = shuffled.foldLeft(kmv.zero)(kmv.reduce)
      assert(kmv.finish(buf) === kmv.finish(buf2))
    }
  }
}
