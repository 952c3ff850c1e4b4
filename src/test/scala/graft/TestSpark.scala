package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("graft-test").getOrCreate()
  val Sf  = "/root/testdata/sf0.001"
}
