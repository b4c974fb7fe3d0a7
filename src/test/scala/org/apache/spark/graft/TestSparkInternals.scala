package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * async listener bus so stage-level assertions (e.g. "no GraphX stage ran
  * in this query") observe every event of the job just executed.
  */
object TestSparkInternals {
  def flushListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
