package graft.util

import org.apache.spark.sql.SparkSession

/** Session-keyed memo for values whose lifetime is tied to one
  * SparkContext (localCheckpointed Datasets, prepared covers): keyed by
  * applicationId + startTime so a restarted context never sees blocks
  * of a dead one, and dead sessions' entries are evicted on the next
  * access instead of accumulating. */
final class SessionCache[T] {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, T]()
  private def key(s: SparkSession) =
    s"${s.sparkContext.applicationId}:${s.sparkContext.startTime}"
  def get(s: SparkSession)(build: => T): T = {
    val k = key(s)
    m.keySet().removeIf(e => e != k) // blocks of dead contexts are gone
    m.computeIfAbsent(k, _ => build)
  }
}
