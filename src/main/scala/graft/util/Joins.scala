package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Bounded broadcast (the r4 kNN pattern, shared): keep a broadcast
  * hint only while the caller's own row estimate stays under the
  * bound. Merely dropping the hint above the bound is NOT enough —
  * Catalyst's Generate stats do not multiply by explode fan-out, so an
  * exploded/fanned-out build side is byte-underestimated and Spark
  * would still auto-broadcast it; the explicit shuffle_hash hint makes
  * the degradation deterministic (hash built per-partition on the
  * build side, nothing collected to the driver). Cost, never result:
  * both strategies join the same rows. */
object Joins {
  def boundedBroadcast(df: DataFrame, estRows: Long, maxRows: Long): DataFrame =
    if (estRows <= maxRows) broadcast(df) else df.hint("shuffle_hash")
}
