package graft

import graft.functions.{LshBucket, MinHashSig, SimHash64, StrHash}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator-driven properties for the pure expression
  * kernels (deterministic seeds; no scalatestplus bridge needed).
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def toks(ws: Seq[String]) =
    new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("StrHash: distinct strings virtually never collide") {
    samples(Gen.listOfN(50, word), 100).foreach { ws =>
      val distinct = ws.distinct
      val hashes   = distinct.map(w => StrHash.hash(UTF8String.fromString(w), 0L))
      assert(hashes.distinct.size === distinct.size, s"collision in $distinct")
    }
  }

  test("StrHash: seed changes the hash") {
    samples(word, 200).foreach { w =>
      val u = UTF8String.fromString(w)
      assert(StrHash.hash(u, 0L) !== StrHash.hash(u, 1L))
    }
  }

  test("SimHash: permutation-invariant (zero distance to shuffled self)") {
    val rnd = new scala.util.Random(7)
    samples(Gen.nonEmptyListOf(word), 100).foreach { ws =>
      val a = SimHash64.compute(toks(ws))
      val b = SimHash64.compute(toks(rnd.shuffle(ws)))
      assert(java.lang.Long.bitCount(a ^ b) === 0)
    }
  }

  test("MinHash: estimate tracks true jaccard within 0.25 (k=128)") {
    val gen = for {
      base    <- Gen.chooseNum(30, 80)
      overlap <- Gen.chooseNum(0, base)
    } yield (base, overlap)
    samples(gen, 100).foreach { case (base, overlap) =>
      val xs = (0 until base).map(i => s"x$i")
      val ys = (0 until overlap).map(i => s"x$i") ++
        (0 until (base - overlap)).map(i => s"y$i")
      val a     = MinHashSig.compute(toks(xs), 128)
      val b     = MinHashSig.compute(toks(ys), 128)
      val est   = (0 until 128).count(i => a.getLong(i) == b.getLong(i)) / 128.0
      val truth = overlap.toDouble / (2 * base - overlap)
      assert(math.abs(est - truth) <= 0.25, s"est=$est truth=$truth base=$base overlap=$overlap")
    }
  }

  test("LshBucket: equal vectors → equal buckets, bucket within range") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f))
    val gen = for { v <- vec; t <- Gen.chooseNum(0, 7) } yield (v, t)
    samples(gen, 200).foreach { case (v, t) =>
      val b1 = LshBucket.compute(new GenericArrayData(v.toArray), t, 6)
      assert(b1 === LshBucket.compute(new GenericArrayData(v.toArray), t, 6))
      assert(b1 >= 0 && b1 < 64)
    }
  }
}
