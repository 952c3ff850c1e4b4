package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The salted path as a registered query on a REAL hot-key workload:
    * `event_type` has ~5 distinct values over every event row, so the
    * unsalted plan funnels 1/5 of the table through single reducers.
    * Salting spreads each type over 32 reducers; the decimal partials
    * compose exactly, so the oracle is the plain GROUP BY.
    */
  def eventTypeTotalsSalted(spark: SparkSession, dir: String): DataFrame =
    saltedSumCount(
      Tables.events(spark, dir),
      "event_type",
      salt = 32,
      Seq("value_sum" -> col("value").cast(Det.Money)))
      .select(
        col("event_type"),
        col("n_rows"),
        Det.detRound(col("value_sum").cast("double"), 2).as("value_sum"))
      .orderBy(col("event_type"))

  private val eventTypeTotalsSaltedSql =
    s"""SELECT event_type,
       |       count(*) AS n_rows,
       |       ${Det.roundSql("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)", 2)} AS value_sum
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "event_type_totals_salted" ->
      QueryDef(eventTypeTotalsSalted, Some(eventTypeTotalsSaltedSql)))
}
