package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-first entry path: temp views + spark.sql, including the
  * graft_* expressions callable from SQL (FunctionRegistry /
  * SparkSessionExtensions surface).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("spark.sql over temp views matches the DataFrame formulation") {
    Tables.orders(spark, TestSpark.Sf).createOrReplaceTempView("orders_v")
    val sql = spark.sql(
      """SELECT o_custkey,
        |       floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * 1e2 + 0.5) / 1e2 AS total_spent,
        |       count(o_orderkey) AS num_orders
        |FROM orders_v
        |GROUP BY o_custkey
        |ORDER BY total_spent DESC, o_custkey
        |LIMIT 10""".stripMargin)
    val df = graft.operators.Commerce.topSpenders(spark, TestSpark.Sf)
    assert(sql.collect().toSeq === df.collect().toSeq)
  }

  test("graft_* expressions are callable from SQL") {
    GraftFunctions.register(spark)
    val cos = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val sim = spark.sql(
      "SELECT graft_simhash(array('spark', 'sql')) AS s").collect().head.getLong(0)
    assert(sim === spark.sql(
      "SELECT graft_simhash(array('sql', 'spark')) AS s").collect().head.getLong(0))
    val mh = spark.sql(
      "SELECT size(graft_minhash(array('a b c'), 16)) AS n").collect().head.getInt(0)
    assert(mh === 16)
  }

  test("embeddings cosine top-1 via pure SQL") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, TestSpark.Sf).createOrReplaceTempView("emb_v")
    val top = spark.sql(
      """SELECT b.vec_id, graft_cosine(a.embedding, b.embedding) AS cos
        |FROM emb_v a JOIN emb_v b ON a.vec_id = 0 AND b.vec_id != 0
        |ORDER BY cos DESC, b.vec_id LIMIT 1""".stripMargin)
      .collect().head
    assert(top.getDouble(1) <= 1.0 && top.getDouble(1) >= -1.0)
  }
}
