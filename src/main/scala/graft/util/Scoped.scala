package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides for EAGER sections (localCheckpoint
  * chains, fixture staging) whose data is orders of magnitude smaller
  * than the session's shuffle sizing — 32 near-empty partitions per
  * tiny shuffle is pure task-scheduling overhead. Only the work
  * executed INSIDE `body` sees the override; anything lazy returned
  * from it plans under the restored setting. Gates run serially
  * (Verify/Bench), so the temporary global mutation cannot leak into a
  * concurrent query. */
object Scoped {
  def shufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
