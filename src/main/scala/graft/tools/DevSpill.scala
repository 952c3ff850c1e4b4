package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** TEMP round-14 diagnostic: per-stage spill/shuffle attribution for one
  * query on a fixture dir. Delete after the spill experiment.
  */
object DevSpill {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val q = args(1)
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m != null && (m.memoryBytesSpilled > 0 || m.shuffleWriteMetrics.bytesWritten > (64L << 20)))
          println(f"### stage ${si.stageId}%3d tasks ${si.numTasks}%4d " +
            f"spillMem ${m.memoryBytesSpilled / (1 << 20)}%6d MiB " +
            f"spillDisk ${m.diskBytesSpilled / (1 << 20)}%6d MiB " +
            f"shufW ${m.shuffleWriteMetrics.bytesWritten / (1 << 20)}%6d MiB " +
            f"shufR ${m.shuffleReadMetrics.totalBytesRead / (1 << 20)}%6d MiB  " +
            si.name.split('\n').head.take(120))
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
    println(f"### total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(1000)
    spark.stop()
  }
}
