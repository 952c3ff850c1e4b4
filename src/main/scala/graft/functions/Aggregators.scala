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
  * estimates depend on merge order). Estimate: (k-1) / kth-min scaled
  * to the hash range.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 8, "KMV needs k >= 8 for a usable estimate")

  override def zero: Array[Long] = Array.empty[Long]

  private def hash(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    // map to non-negative for a clean [0, 2^63) range
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  private def keepSmallest(values: Array[Long]): Array[Long] = {
    val distinct = values.distinct
    java.util.Arrays.sort(distinct)
    distinct.take(k)
  }

  override def reduce(buf: Array[Long], x: Long): Array[Long] =
    keepSmallest(buf :+ hash(x))

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    keepSmallest(a ++ b)

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble // saw fewer than k distinct
    else (k - 1).toDouble * Long.MaxValue.toDouble / buf.last.toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.Encoders.javaSerialization[Array[Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvDistinct {
  /** Untyped DataFrame form: `df.agg(KmvDistinct.udf(64)(col("x")))`. */
  def udf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvDistinct(k), Encoders.scalaLong)
}
