package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q_sessionize row semantics + equivalence with Spark's native
  * session_window (the Structured-Streaming-compatible formulation). */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val G = 86400000000L // 24 h in µs

  private def sessions(rows: Seq[(Long, Long, Long)]) = { // (user, event, µs)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    rows.toDF("user_id", "event_id", "t")
      .withColumn("new_s",
        when(col("t") - lag("t", 1).over(w) > G, 1L).otherwise(
          when(lag("t", 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("sess", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("user_id", "sess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("gap exactly at the threshold merges; one past it splits") {
    assert(sessions(Seq((1L, 1L, 0L), (1L, 2L, G), (1L, 3L, 2 * G + 1))) ===
      Seq((1L, 1L, 2L), (1L, 2L, 1L)))
  }

  test("sessions are per-user islands") {
    // user 2's event lands in time between user 1's two events; user
    // 1's small gap still merges — the split rule is per-user only
    assert(sessions(Seq((1L, 1L, 0L), (2L, 2L, 1L), (1L, 3L, 1000L))) ===
      Seq((1L, 1L, 2L), (2L, 1L, 1L)))
  }

  test("q_sessionize matches the session_window twin on testdata") {
    val sf = "/root/testdata/sf0.001"
    val events = spark.read.parquet(s"$sf/events.parquet")
    // precondition that makes the two gap rules (≤G merges vs <G
    // merges) coincide: no adjacent same-user gap is exactly G
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val exact = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .withColumn("gap", col("t") - lag("t", 1).over(w))
      .filter(col("gap") === G).count()
    assert(exact === 0L)

    val twin = events
      .groupBy(col("user_id"), session_window(col("ts"), "24 hours"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts").cast("timestamp"))).as("start_us"),
        (max(unix_micros(col("ts").cast("timestamp"))) -
          min(unix_micros(col("ts").cast("timestamp")))).as("dur_us"))
      .select("user_id", "n_events", "start_us", "dur_us")
      .orderBy("user_id", "start_us")
      .collect().toSeq
    val gate = graft.SparkEntry.queries("q_sessionize")(spark, sf)
      .select("user_id", "n_events", "start_us", "dur_us")
      .orderBy("user_id", "start_us")
      .collect().toSeq
    assert(gate === twin)
  }
}
