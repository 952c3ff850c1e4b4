package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers. AQE's skew-join splitting covers joins; for
  * aggregations with pathological hot keys the classic remedy is
  * two-stage salted aggregation — partial aggregate on (key, salt) so a
  * hot key's rows spread over `salt` reducers, then final aggregate on
  * key. Works for any commutative/associative partials (all Det decimal
  * sums and counts compose exactly, so results are bit-identical to the
  * unsalted plan — asserted in SkewSpec).
  */
object Skew {

  /** Two-stage salted sum/count aggregation.
    * @param partials (outputName -> column to decimal-sum) pairs
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      salt: Int,
      partials: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val stage1 = salted
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        partials.map { case (n, c) => sum(c).as(s"__$n") }: _*)
    stage1
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n_rows"),
        partials.map { case (n, _) => sum(col(s"__$n")).as(n) }: _*)
  }
}
