package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Dev profiling entry: time named queries (after a warmup) and print
  * formatted plans. Usage: runMain graft.tools.Profile <sfDir> <name>...
  * PROFILE_EXPLAIN=1 prints each plan; PROFILE_EXPLAIN_ONLY=1 prints
  * plans WITHOUT executing — the triage mode for a query that OOMs at
  * probe scale (the plan shows the join strategy that would run).
  * Explain-only also disables lineage cuts (spark.graft.lineageCut
  * .disabled) so eager checkpoints inside query CONSTRUCTION don't
  * execute the very stage being triaged; stored-artifact builds
  * (DerivedCache) still run on first construction — point the probe at
  * a dir whose caches exist, or accept the one-time build.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val explainOnly = sys.env.contains("PROFILE_EXPLAIN_ONLY")
    if (explainOnly) {
      spark.conf.set("spark.graft.lineageCut.disabled", "true")
      names.foreach { n =>
        println(s"===== PLAN $n")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
      spark.stop()
      return
    }
    // warm the JIT/codegen path once
    SparkEntry.queries(names.head)(spark, sfDir).write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("PROFILE_EXPLAIN")) {
        println(s"===== PLAN $n"); df.explain("formatted")
      }
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"===== TIME $n%-24s ${runs.min}%.3f s (runs: ${runs.map(r => f"$r%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
