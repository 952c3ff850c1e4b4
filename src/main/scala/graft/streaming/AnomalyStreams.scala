package graft.streaming

import graft.{QueryDef, Tables}
import graft.operators.Temporal
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of `ts_anomaly`, registered as a batch-checkable
  * query (the stream_dedup_ingest pattern): events arrive as a bounded
  * file stream, each micro-batch folds into mergeable per-(type, hour)
  * count partials appended exactly-once (checkpointed foreachBatch),
  * and the anomaly scoring runs over the merged state — which equals
  * the batch aggregate for ANY partitioning of the stream, so the query
  * shares ts_anomaly's DuckDB oracle verbatim.
  *
  * This is the 100 TB monitoring shape: per-batch cost ∝ batch size,
  * state is wall-clock-bounded (hours × types), and the expensive
  * seasonal scoring never touches raw events — it reads the state.
  */
object AnomalyStreams {

  def streamTsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables
      .events(spark, dir)
      .select(col("event_type"), expr(s"ts div ${Temporal.HourUs}").as("hour"))
    // deterministic 4-file stream source, built once per corpus
    val rows = Tables.cachedCount(spark, dir, "events")
    val srcDir = graft.sources.DerivedCache.dir(
      dir, "stream-anomaly-src", s"rows=$rows;files=4") { out =>
      ev.repartition(4, col("hour"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$out/files")
      ()
    } + "/files"
    StreamRunner.runAvailableNow(
      spark,
      schema = ev.schema,
      srcDir = srcDir,
      maxFilesPerTrigger = 2,
      tmpPrefix = "graft-stream-anomaly",
      mkHandler = outDir =>
        (batch, _) => {
          batch
            .groupBy(col("event_type"), col("hour"))
            .agg(count(lit(1)).as("cnt"))
            .write.mode("append").parquet(outDir)
          ()
        },
      finish = partials =>
        Temporal.scoreHourly(
          partials
            .groupBy(col("event_type"), col("hour"))
            .agg(sum(col("cnt")).cast("long").as("cnt"))),
      // zero-row events: run the REAL scoring chain over an empty counts
      // frame so the empty-case schema can never drift from the batch
      // query's (EmptyInputSpec contract, manifestView precedent)
      empty = Temporal.scoreHourly(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(
              "event_type", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField(
              "hour", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField(
              "cnt", org.apache.spark.sql.types.LongType, nullable = false))))))
  }

  val defs: Map[String, QueryDef] = Map(
    "stream_ts_anomaly" -> QueryDef(streamTsAnomaly, Some(Temporal.tsAnomalySql)))
}
