package graft

import graft.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit kernels of the custom Catalyst expressions. */
class FunctionsSpec extends AnyFunSuite {

  private def arr(xs: Float*) = new GenericArrayData(xs.toArray)
  private def toks(ws: String*) =
    new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])

  test("cosine: identical vectors → 1.0 (within fp)") {
    val v = arr(0.1f, -0.2f, 0.3f)
    assert(math.abs(CosineSim.compute(v, v) - 1.0) < 1e-12)
  }

  test("cosine: orthogonal vectors → 0.0") {
    assert(CosineSim.compute(arr(1f, 0f), arr(0f, 1f)) === 0.0)
  }

  test("cosine: opposite vectors → -1.0") {
    val d = CosineSim.compute(arr(1f, 2f), arr(-1f, -2f))
    assert(math.abs(d + 1.0) < 1e-12)
  }

  test("cosine: zero vector → -1.0 (DuckDB list_cosine_similarity convention)") {
    // a zero vector has no direction: "least similar" makes it rank
    // LAST in every top-k, identically on both engines (edge_sweep)
    assert(CosineSim.compute(arr(0f, 0f), arr(1f, 2f)) === -1.0)
    assert(CosineSim.compute(arr(0f, 0f), arr(0f, 0f)) === -1.0)
  }

  test("simhash: deterministic, order-insensitive for same multiset") {
    val a = SimHash64.compute(toks("spark", "scala", "data"))
    val b = SimHash64.compute(toks("data", "spark", "scala"))
    assert(a === b)
  }

  test("simhash: near-identical token sets differ in few bits") {
    val base  = (1 to 60).map(i => s"tok$i")
    val a     = SimHash64.compute(toks(base: _*))
    val b     = SimHash64.compute(toks((base.drop(2) :+ "other" :+ "extra"): _*))
    val dist  = java.lang.Long.bitCount(a ^ b)
    assert(dist <= 16, s"hamming $dist too large for near-identical sets")
  }

  test("minhash: identical shingle sets → identical signatures") {
    val a = MinHashSig.compute(toks("a b c", "b c d", "c d e"), 64)
    val b = MinHashSig.compute(toks("c d e", "a b c", "b c d"), 64)
    assert((0 until 64).forall(i => a.getLong(i) == b.getLong(i)))
  }

  test("minhash: signature agreement approximates jaccard") {
    val xs = (1 to 100).map(i => s"sh$i")
    val ys = (21 to 120).map(i => s"sh$i") // jaccard = 80/120 ≈ 0.667
    val k  = 128
    val a  = MinHashSig.compute(toks(xs: _*), k)
    val b  = MinHashSig.compute(toks(ys: _*), k)
    val eq = (0 until k).count(i => a.getLong(i) == b.getLong(i))
    val est = eq.toDouble / k
    assert(math.abs(est - 0.667) < 0.15, s"estimate $est too far from 0.667")
  }

  test("lsh bucket: deterministic and within plane range") {
    val v  = arr(0.3f, -0.1f, 0.7f, 0.2f)
    val b1 = LshBucket.compute(v, 0, 6)
    val b2 = LshBucket.compute(v, 0, 6)
    assert(b1 === b2 && b1 >= 0 && b1 < 64)
    // a different table gives (almost surely) a different projection
    assert(LshBucket.compute(v, 1, 6) >= 0)
  }

  test("sig_matches: equals the zip_with/filter/size HOF form") {
    def la(xs: Long*) = new GenericArrayData(xs.toArray)
    def ia(xs: Int*)  = new GenericArrayData(xs.toArray)
    val a = la(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val b = la(1L, 9L, 3L, 4L, 0L, 6L, 7L, 1L)
    // HOF reference: positions equal -> 1,3,4,6,7 (0-based 0,2,3,5,6)
    assert(SigMatches.compute(a, b, false, false) === 5)
    // length mismatch: zip_with pads with null, padded positions never count
    assert(SigMatches.compute(la(1L, 2L, 3L), la(1L, 2L, 3L, 4L), false, false) === 3)
    // int/long mixed sides compare widened (the funnel narrows to int32)
    assert(SigMatches.compute(ia(1, 2, 3), la(1L, 9L, 3L), true, false) === 2)
    assert(SigMatches.compute(la(), la(1L), false, false) === 0)
  }

  test("sig_band_hit: aligned all-equal band of width w, trailing partial skipped") {
    def la(xs: Long*) = new GenericArrayData(xs.toArray)
    // band 1 (positions 4..7) fully equal -> hit
    val a = la(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val b = la(9L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    assert(SigBandHit.compute(a, b, 4, false, false))
    // every band has one mismatch -> no hit
    val c = la(9L, 2L, 3L, 4L, 5L, 0L, 7L, 8L)
    assert(!SigBandHit.compute(a, c, 4, false, false))
    // 3 trailing equal positions do NOT form a band at w=4
    assert(!SigBandHit.compute(la(0L, 1L, 2L, 3L), la(9L, 1L, 2L, 3L), 4, false, false))
  }
}
