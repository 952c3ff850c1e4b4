package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset surface (round 2): the same engine queries are
  * expressible against case-class Datasets when compile-time safety
  * matters more than Catalyst's untyped optimizations. This module
  * registers one such query end to end — `as[T]` with implicit
  * product Encoders, `groupByKey`/`mapGroups` with JVM-side exact
  * BigDecimal arithmetic — so the typed path is oracle-verified like
  * every untyped one.
  *
  * Scale note: mapGroups shuffles whole rows (no partial aggregation) —
  * the right tool for genuinely non-decomposable per-group logic; for
  * decomposable aggregates the untyped agg (top_spenders) or a typed
  * Aggregator (KmvDistinct) is the scalable form. The Scaladoc here is
  * the warning label; the query keeps groups small (orders per
  * customer).
  */
object Typed {

  final case class OrderRow(
      o_orderkey: Long,
      o_custkey: Long,
      o_totalprice: Double,
      o_orderdate: java.sql.Date)

  final case class CustOrderStats(
      o_custkey: Long,
      n_orders: Long,
      total_spent: Double,
      max_single_order: Double,
      last_order_date: String)

  /** Per-customer order stats through the typed API: exact BigDecimal
    * sums inside mapGroups (order-independent), emitted as a typed
    * Dataset, then ranked. Top 50 by spend.
    */
  def typedOrderStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        // parquet stores the date as TIMESTAMP_NTZ; the typed row wants DATE
        col("o_orderdate").cast("date").as("o_orderdate"))
      .as[OrderRow]
      .groupByKey(_.o_custkey)
      .mapGroups { (custkey, rows) =>
        var n = 0L
        var total = BigDecimal(0)
        var maxOrder = BigDecimal(0)
        var lastDate = ""
        rows.foreach { r =>
          n += 1
          val p = BigDecimal(r.o_totalprice).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          total += p
          if (p > maxOrder) maxOrder = p
          val d = r.o_orderdate.toString
          if (d > lastDate) lastDate = d
        }
        CustOrderStats(custkey, n, total.toDouble, maxOrder.toDouble, lastDate)
      }
      .toDF()
      .orderBy(desc("total_spent"), asc("o_custkey"))
      .limit(50)
  }

  private val typedOrderStatsSql =
    s"""SELECT o_custkey,
       |       count(*) AS n_orders,
       |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
       |       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_single_order,
       |       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order_date
       |FROM orders
       |GROUP BY o_custkey
       |ORDER BY total_spent DESC, o_custkey
       |LIMIT 50""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "typed_order_stats" -> QueryDef(typedOrderStats, Some(typedOrderStatsSql)))
}
