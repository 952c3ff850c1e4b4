package graft.operators

import graft.{Det, QueryDef, Tables}
import graft.functions.KmvDistinct
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-vs-exact cardinality accounting (round 2): registers the KMV
  * typed Aggregator and the built-in HLL++ (`approx_count_distinct`) as a
  * first-class query next to the exact answer, per event type — the
  * "how wrong is the cheap estimate" query every 100 TB pipeline runs
  * before switching its dashboards to sketches.
  *
  * Exact side is the two-stage distinct (pre-aggregate on the key — no
  * Expand plan); sketch sides are single-pass partial aggregates whose
  * merge is partition-order-invariant, so all three columns are
  * deterministic. Rows-only check (DuckDB's approx_distinct uses a
  * different HLL seed — numbers can't match an oracle by design);
  * estimate-accuracy invariants are spec-asserted instead.
  */
object Sketches {

  def distinctUsersSketch(spark: SparkSession, dir: String): DataFrame = {
    val ev  = Tables.events(spark, dir)
    val kmv = KmvDistinct.udf(256)
    val exact = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_distinct"))
    val sketched = ev
      .groupBy(col("event_type"))
      .agg(
        kmv(col("user_id")).as("kmv_est"),
        approx_count_distinct(col("user_id")).as("hll_est"))
    exact
      .join(sketched, "event_type")
      .select(
        col("event_type"),
        col("exact_distinct"),
        Det.detRound(col("kmv_est"), 2).as("kmv_est"),
        col("hll_est"),
        Det.detRound(
          abs(col("kmv_est") - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("kmv_rel_err"),
        Det.detRound(
          abs(col("hll_est").cast("double") - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("hll_rel_err"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, QueryDef] = Map(
    "distinct_users_sketch" -> QueryDef(distinctUsersSketch, None))
}
