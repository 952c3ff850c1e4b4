package org.apache.spark

/** Test-only bridge into the private[spark] listener bus: asserting
  * "no Spark job fired" needs the async bus DRAINED, not a sleep that
  * can mask a late-arriving job event on a loaded machine (and wastes a
  * fixed 1.5 s per run). Same mechanism Spark's own tests use.
  */
object GraftTestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
