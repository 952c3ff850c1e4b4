package graft.streaming

import graft.{QueryDef, Tables}
import graft.operators.Temporal
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

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
    val tmp    = java.nio.file.Files.createTempDirectory("graft-stream-anomaly")
    val outDir = s"$tmp/partials"
    val handler: (Dataset[Row], Long) => Unit = (batch, _) => {
      batch
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("cnt"))
        .write.mode("append").parquet(outDir)
      ()
    }
    val query = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch(handler)
      .start()
    query.awaitTermination()
    val produced = {
      val d = new java.io.File(outDir)
      d.exists && Option(d.listFiles).exists(_.exists(_.getName.endsWith(".parquet")))
    }
    val result =
      if (produced) {
        val merged = spark.read
          .parquet(outDir)
          .groupBy(col("event_type"), col("hour"))
          .agg(sum(col("cnt")).cast("long").as("cnt"))
        // scoreHourly checkpoints its input, so the temp partials tree
        // is safe to delete right after the frame materializes
        Temporal.scoreHourly(merged).localCheckpoint()
      } else {
        // zero-row events: no data batches ran — empty frame with the
        // scoring schema (EmptyInputSpec contract)
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          StructType(Seq(
            StructField("event_type", StringType),
            StructField("hour", LongType),
            StructField("cnt", LongType),
            StructField("baseline_mean", DoubleType),
            StructField("z", DoubleType))))
      }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(tmp.toFile)
    result
  }

  val defs: Map[String, QueryDef] = Map(
    "stream_ts_anomaly" -> QueryDef(streamTsAnomaly, Some(Temporal.tsAnomalySql)))
}
