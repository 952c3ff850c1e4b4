package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only shuffle audit: runs every registered query and attributes
  * input bytes vs shuffle-write bytes to each (stage-completion deltas
  * between queries — queries run sequentially, so the delta is exact up
  * to listener-bus drain). This turns the "minimize shuffles" design
  * claims into numbers: a query whose shuffle bytes rival its input
  * bytes is moving data it should have pre-aggregated, broadcast, or
  * hashed first.
  *
  * Usage: runMain graft.tools.ShuffleAudit [sfDir] — prints one line
  * per query + a JSON summary line.
  */
object ShuffleAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val input    = new AtomicLong(0)
    val shuffleW = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          input.addAndGet(m.inputMetrics.bytesRead)
          shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })

    // one warm query so listener/codegen infra is up before deltas start
    SparkEntry.queries("top_spenders")(spark, sfDir)
      .write.mode("overwrite").format("noop").save()

    def drain(): Unit = {
      // listener events are async; a short quiesce after the blocking
      // action keeps deltas attributable (dev tool, not a gate)
      Thread.sleep(400)
    }
    drain()

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val i0 = input.get(); val w0 = shuffleW.get()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      drain()
      val in = input.get() - i0
      val sh = shuffleW.get() - w0
      // local-fs parquet scans under-report bytesRead, so the
      // actionable number is absolute shuffle volume (compare against
      // the on-disk table sizes); raw input deltas stay in the JSON
      println(f"### $name%-28s shuffle=${sh / 1e6}%9.1f MB")
      (name, in, sh)
    }
    val totIn = rows.map(_._2).sum
    val totSh = rows.map(_._3).sum
    val qs = rows
      .map { case (n, i, s) => s""""$n":[$i,$s]""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"shuffle_audit","input_bytes":$totIn,"shuffle_bytes":$totSh,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
