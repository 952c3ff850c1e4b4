package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev profiling entry: per-stage wall/task attribution for one query
  * (SparkListener metrics) — the empirical loop of guide §1.1 without
  * the UI. Covers query CONSTRUCTION too (eager lineage cuts, trainer
  * jobs), which is where iterative queries spend their time and what
  * the bench's cold numbers include.
  * Usage: runMain graft.tools.StageProfile <sfDir> <query>...
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir   = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("ann_pq")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(name: String, var subm: Long = 0, var done: Long = 0,
        var tasks: Int = 0, var taskTimeMs: Long = 0)
    val stages = mutable.LinkedHashMap[Int, St]()
    var jobs   = 0
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        stages.synchronized { jobs += 1 }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages(e.stageInfo.stageId) =
            St(e.stageInfo.name.split("\n").head.take(90), System.currentTimeMillis())
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          stages.get(e.stageInfo.stageId).foreach { s =>
            s.done = System.currentTimeMillis()
            s.tasks = e.stageInfo.numTasks
          }
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stages.synchronized {
          stages.get(e.stageId).foreach { s =>
            if (e.taskInfo != null) s.taskTimeMs += e.taskInfo.duration
          }
        }
    }

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // one full warm pass first (trainers memoize, codegen warms) so
      // the measured pass matches the bench's post-prebuild cold state
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      graft.QueryState.release(spark)
      stages.synchronized { stages.clear(); jobs = 0 }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = fn(spark, dir) // construction: eager cuts, scalar jobs
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300)
      println(f"PROF $n wall=$wall%.3f s (build=$tBuild%.3f) jobs=$jobs stages=${stages.size}")
      stages.synchronized {
        stages.values.foreach { s =>
          val w = if (s.done > 0) (s.done - s.subm) / 1e3 else -1.0
          if (w >= 0.08 || s.taskTimeMs > 300)
            println(f"  stage wall=$w%6.3f tasks=${s.tasks}%3d taskTime=${s.taskTimeMs / 1e3}%7.3f")
        }
      }
      graft.QueryState.release(spark)
    }
    spark.stop()
  }
}
