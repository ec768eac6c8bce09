package org.apache.spark

/** Access bridge: the listener bus drain used by graft.util.Progress is
  * private[spark]. Test-support only; no Spark behavior modified. */
package object graftmetrics {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
