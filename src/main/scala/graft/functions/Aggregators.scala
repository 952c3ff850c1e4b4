package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator[Long, Array[Long], Double]` — the third rung of the
  * custom-function ladder next to the codegen'd expressions and the
  * TopKPerKey operator.
  *
  * Buffer = the k smallest hash values seen. Merge = union + keep k
  * smallest — commutative, associative, and therefore DETERMINISTIC
  * under any partitioning (unlike e.g. SpaceSaving sketches whose
  * estimates depend on merge order). Estimate: (k−1)·2^60 / kth-min
  * (the hash is a uniform 60-bit draw).
  *
  * Hashing is PORTABLE (PortableHash.md5h60 of the value's decimal
  * string), so a SQL oracle can recompute the identical estimate as the
  * k-th order statistic of the distinct hashes — the sketch query is
  * hash-compared against DuckDB, not just spec-bounded.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 8, "KMV needs k >= 8 for a usable estimate")

  override def zero: Array[Long] = Array.empty[Long]

  private def hash(x: Long): Long =
    PortableHash.md5h60(
      x.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  private def keepSmallest(values: Array[Long]): Array[Long] = {
    val distinct = values.distinct
    java.util.Arrays.sort(distinct)
    distinct.take(k)
  }

  /** Buffer invariant: sorted ascending, distinct, ≤ k entries. The hot
    * per-row path is a binary search + (only when the hash belongs in
    * the sketch) one arraycopy insertion — O(log k) for the common
    * "hash too large, ignore" case instead of the naive sort-per-row.
    */
  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    if (x == KmvDistinct.NullSentinel) return buf
    val h = hash(x)
    if (buf.length == k && h >= buf(buf.length - 1)) return buf
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    val outLen = math.min(buf.length + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    keepSmallest(a ++ b)

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble // saw fewer than k distinct
    else (k - 1).toDouble * KmvDistinct.HashRange / buf.last.toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.Encoders.javaSerialization[Array[Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvDistinct {
  /** 2^60 as an exact double — md5h60 draws uniformly from [0, 2^60). */
  val HashRange: Double = 1152921504606846976L.toDouble

  /** Reduce-side skip marker: callers that must NOT count SQL NULL as a
    * distinct value coalesce the (nullable) input to this sentinel, which
    * `reduce` ignores — matching `countDistinct`'s NULL-exclusion so the
    * routed sketch profile and the exact profile agree on nullable
    * columns. Safe because every caller feeds either md5-h60 hashes
    * (∈ [0, 2^60)) or synthetic ids, none of which is Long.MinValue.
    */
  val NullSentinel: Long = Long.MinValue

  /** Untyped DataFrame form: `df.agg(KmvDistinct.udf(64)(col("x")))`. */
  def udf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvDistinct(k), Encoders.scalaLong)
}

/** KMV PARTIAL sketch: identical buffer/reduce/merge to [[KmvDistinct]]
  * but `finish` returns the sketch itself (the sorted min-k hash array,
  * as a real `array<bigint>` column) instead of collapsing it to the
  * estimate. This is the store-and-merge half of the sketch lifecycle a
  * 100 TB pipeline actually runs: per-partition (per-day, per-source)
  * partials are persisted once, then UNIONS of partitions are answered by
  * merging the stored arrays in-row — union of per-part min-k sets ⊇ the
  * min-k of the union, so re-sorting the concatenation and truncating to
  * k reproduces the direct sketch of the union exactly. Estimation from a
  * merged array is the same (k−1)·2^60/h_k rule (see
  * Warehouse.rollingDistinctKmv for the windowed form, oracle-checked).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val inner = new KmvDistinct(k)
  override def zero: Array[Long] = inner.zero
  override def reduce(buf: Array[Long], x: Long): Array[Long] = inner.reduce(buf, x)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  def udf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvSketch(k), Encoders.scalaLong)
}

/** Mergeable Misra-Gries frequent-items summary as a typed
  * `Aggregator[Long, mutable.HashMap[Long, Long], Seq[(Long, Long)]]`.
  *
  * Buffer = item → count, exact until it exceeds 2k entries, then
  * compressed by subtracting the (k+1)-th largest count and dropping
  * non-positives (the classic decrement step, applied in batch so
  * per-row cost stays O(1) amortized). Merge = count-sum + the same
  * compression. The standard bound holds under ANY merge tree: a final
  * count undercounts the true frequency by at most n/(k+1), so every
  * item with true frequency ≥ n/(k+1) is guaranteed to survive as a
  * candidate. Exact-answer recipe (HeavyHitters query): MG pass for
  * candidates → exact count of candidates → threshold filter; the
  * result is provably identical to the full groupBy as long as the
  * threshold exceeds n/(k+1) — which the query asserts.
  */
class FrequentItems(k: Int)
  extends Aggregator[Long, scala.collection.mutable.HashMap[Long, Long], Seq[(Long, Long)]] {
  import scala.collection.mutable
  require(k >= 16, "FrequentItems needs k >= 16")
  private val cap = 2 * k

  override def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty

  private def compress(
      m: mutable.HashMap[Long, Long], target: Int): mutable.HashMap[Long, Long] = {
    if (m.size <= target) return m
    val counts = m.values.toArray
    java.util.Arrays.sort(counts)
    val pivot = counts(counts.length - target - 1) // (target+1)-th largest
    val out = mutable.HashMap.empty[Long, Long]
    m.foreach { case (item, c) => if (c > pivot) out.update(item, c - pivot) }
    out
  }

  override def reduce(
      m: mutable.HashMap[Long, Long], x: Long): mutable.HashMap[Long, Long] = {
    m.update(x, m.getOrElse(x, 0L) + 1L)
    if (m.size > cap) compress(m, k) else m
  }

  override def merge(
      a: mutable.HashMap[Long, Long],
      b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (item, c) => big.update(item, big.getOrElse(item, 0L) + c) }
    if (big.size > k) compress(big, k) else big
  }

  /** Candidates sorted by (count desc, item asc) — deterministic output
    * for a given buffer; counts are lower bounds, not exact.
    */
  override def finish(m: scala.collection.mutable.HashMap[Long, Long]): Seq[(Long, Long)] =
    m.toSeq.sortBy { case (item, c) => (-c, item) }

  override def bufferEncoder: Encoder[scala.collection.mutable.HashMap[Long, Long]] =
    Encoders.javaSerialization[scala.collection.mutable.HashMap[Long, Long]]
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

object FrequentItems {
  /** Untyped form: returns array<struct<_1: item, _2: mg_count>>. */
  def udf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new FrequentItems(k), Encoders.scalaLong)
}

/** KLL-style mergeable quantile sketch (Karnin–Lang–Liberty 2016; the
  * level/compactor scheme of Munro–Paterson/MRL) as a typed
  * `Aggregator[Double, KllState, Seq[Double]]` — the quantile aggregate
  * that scales where exact `percentile` cannot: exact percentile
  * collects every group value onto one reducer, O(group) memory; the
  * sketch is O(k log(n/k)) per group and merges associatively, so
  * partial aggregation (map-side combine) applies like any sum.
  *
  * Structure: level l holds items of weight 2^l. New items enter level
  * 0; when total size exceeds total capacity the lowest over-capacity
  * level is sorted and every other item (random offset) is promoted to
  * level l+1 — halving the buffer, doubling the weight. Level
  * capacities decay geometrically (×2/3) below the top level, the KLL
  * refinement over MRL's uniform buffers. Each level-l compaction
  * perturbs any rank by ≤ 2^l, and with random offsets the signed
  * errors cancel: expected rank error O(n/k) with log-factor worst
  * case. The "coin" is a deterministic bit drawn from the buffer
  * content (doubleToLongBits xor), so a run is reproducible given its
  * merge tree while remaining unbiased across compactions.
  *
  * finish() returns the value estimates at the requested quantiles —
  * the weighted order statistics of the surviving items. The query
  * surface (operators.Sketches.valueQuantilesSketch) checks the rank
  * error of every estimate against the exact ranks IN the query, so the
  * DuckDB row carries the bound verdict, not the engine-private sketch
  * state.
  */
final case class KllState(count: Long, levels: Vector[Vector[Double]])

class KllQuantiles(k: Int, qs: Seq[Double])
  extends Aggregator[Double, KllState, Seq[Double]] {
  require(k >= 32, "KLL needs k >= 32 for a usable bound")
  require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1))

  override def zero: KllState = KllState(0L, Vector(Vector.empty))

  private def cap(l: Int, h: Int): Int =
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, (h - 1 - l).toDouble)).toInt)

  private def totalCap(h: Int): Int = (0 until h).map(cap(_, h)).sum

  /** Deterministic unbiased coin: parity of a hash of the buffer's
    * content and the running count.
    */
  private def coin(buf: Vector[Double], count: Long, l: Int): Int = {
    var h = count ^ (l.toLong << 32)
    h ^= java.lang.Double.doubleToLongBits(buf.head) * 0x9e3779b97f4a7c15L
    h ^= java.lang.Double.doubleToLongBits(buf.last) + (buf.size.toLong << 17)
    h ^= h >>> 33
    (h & 1L).toInt
  }

  /** Sort and halve the lowest over-capacity level, promoting survivors
    * one level up. No-op if nothing is over capacity.
    */
  private def compressOnce(s: KllState): KllState = {
    val h = s.levels.size
    val over = s.levels.indices.find(l => s.levels(l).size > cap(l, h))
    over match {
      case None => s
      case Some(l) =>
        val sorted = s.levels(l).sorted
        val off    = coin(sorted, s.count, l)
        val kept   = sorted.indices.collect {
          case i if i % 2 == off => sorted(i)
        }.toVector
        val withNext =
          if (l + 1 < h) s.levels
          else s.levels :+ Vector.empty[Double]
        val next = withNext
          .updated(l, Vector.empty[Double])
          .updated(l + 1, withNext(l + 1) ++ kept)
        s.copy(levels = next)
    }
  }

  private def compress(s: KllState): KllState = {
    var cur = s
    while (cur.levels.map(_.size).sum > totalCap(cur.levels.size)) {
      val nxt = compressOnce(cur)
      if (nxt eq cur) return cur // nothing over per-level cap: stable
      cur = nxt
    }
    cur
  }

  override def reduce(s: KllState, x: Double): KllState =
    compress(KllState(s.count + 1, s.levels.updated(0, s.levels(0) :+ x)))

  override def merge(a: KllState, b: KllState): KllState = {
    val h = math.max(a.levels.size, b.levels.size)
    val levels = Vector.tabulate(h) { l =>
      (if (l < a.levels.size) a.levels(l) else Vector.empty) ++
        (if (l < b.levels.size) b.levels(l) else Vector.empty)
    }
    compress(KllState(a.count + b.count, levels))
  }

  /** Weighted order statistics at each requested quantile. */
  override def finish(s: KllState): Seq[Double] = {
    if (s.count == 0L) return qs.map(_ => Double.NaN)
    val weighted = s.levels.zipWithIndex.flatMap { case (buf, l) =>
      val w = 1L << l
      buf.map(v => (v, w))
    }.sortBy(_._1)
    qs.map { q =>
      val target = q * s.count
      var acc = 0L
      var i = 0
      while (i < weighted.size && acc + weighted(i)._2 < target) {
        acc += weighted(i)._2; i += 1
      }
      weighted(math.min(i, weighted.size - 1))._1
    }
  }

  override def bufferEncoder: Encoder[KllState] =
    Encoders.javaSerialization[KllState]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object KllQuantiles {
  /** Untyped form: `df.agg(KllQuantiles.udf(256, Seq(.25,.5,.9))(col("x")))`. */
  def udf(k: Int, qs: Seq[Double]): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KllQuantiles(k, qs), Encoders.scalaDouble)
}

/** Mergeable Bloom filter as a typed
  * `Aggregator[(Long, Long), Array[Long], Array[Long]]` — the runtime
  * join-pruning sketch: build the filter over a (filtered) build side's
  * join keys, broadcast the finished bitset (numBits/8 bytes, size-bounded
  * and INDEPENDENT of build-side cardinality), and pre-filter the probe
  * side before the shuffle join. No false negatives ever, so an exact
  * join on the survivors restores exact semantics; false positives only
  * cost wasted probe rows (~p^k for load p).
  *
  * The aggregator takes PRE-HASHED input `(h1, h2)` — both produced by
  * the codegen'd builtin `xxhash64` in the query — and only does the bit
  * math, so the per-row membership probe on the other side uses the very
  * same builtin hashes and stays inside whole-stage codegen (see
  * `Pipeline.bloomMightContain`). Bit positions follow Kirsch-
  * Mitzenmacher double hashing, with both hashes first reduced mod the
  * table size so position arithmetic never overflows a long (Spark 4
  * runs ANSI mode: a wrap that Java would silently accept throws there).
  * Merge = bitwise OR — commutative, associative, deterministic under
  * any partitioning.
  */
class BloomBits(numBits: Int, numHashes: Int)
  extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(numBits >= 64 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 16)
  private val words = numBits / 64

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val g1 = java.lang.Math.floorMod(in._1, numBits.toLong)
    val g2 = java.lang.Math.floorMod(in._2, numBits - 1L) + 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(g1 + i * g2, numBits.toLong).toInt
      buf(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.javaSerialization[Array[Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomBits {
  /** Untyped form over two pre-hashed columns:
    * `df.agg(BloomBits.udf(1 << 16, 4)(col("h1"), col("h2")))`.
    */
  def udf(numBits: Int, numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new BloomBits(numBits, numHashes),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
