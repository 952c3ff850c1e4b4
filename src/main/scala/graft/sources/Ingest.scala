package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingest-side parity with the reference's load pipeline
  * (SURVEY.md §2.1): multiline-JSON → schema'd DataFrame → partitioned,
  * range-ordered parquet. The reference's HBase rowkey
  * `user_id|start_time|session_id` (load_hbase_sessions_stream.py:34–38)
  * is a physical-layout device for per-user prefix scans; the Spark
  * analog is partitioned parquet (`partitionBy` bucket column) plus
  * in-file ordering (`sortWithinPartitions`), which turns per-user
  * queries into partition-pruned, mostly-sorted scans.
  */
object Ingest {

  /** S1/S3/S13: multiline JSON array files → DataFrame with an explicit
    * schema (never inferred — schema-on-write discipline).
    */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("multiline", "true").schema(schema).json(path)

  /** S4/S5/O4: write a fact table as parquet partitioned by a derived
    * bucket of the entity key (bounded partition count at any scale) and
    * range-ordered within files by (entity, time) — the rowkey analog.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      entityCol: String,
      timeCol: String,
      buckets: Int): Unit = {
    df.withColumn("bucket", pmod(col(entityCol), lit(buckets)))
      .repartition(col("bucket"))
      .sortWithinPartitions(col(entityCol), col(timeCol))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(path)
  }

  /** The prefix-scan read path over the partitioned layout: the bucket
    * predicate prunes partitions (directory-level skip) before any file
    * is opened; the entity predicate pushes to the parquet reader.
    */
  def readEntity(
      spark: SparkSession,
      path: String,
      entityCol: String,
      entityId: Long,
      buckets: Int): DataFrame =
    spark.read
      .parquet(path)
      .filter(col("bucket") === entityId % buckets && col(entityCol) === entityId)
}
