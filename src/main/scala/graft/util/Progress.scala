package graft.util

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Progress/metrics emitter (SURVEY.md A11; reference prints a formatted
  * count every 10M elements, src/lib.rs:58-61,104-113). Spark-native
  * version: a SparkListener folds task metrics into running totals and
  * logs every `reportEvery` input records; totals land in the run
  * report (and, via Pipeline, into snapshot manifests). */
final class Progress(reportEvery: Long = 10000000L) extends SparkListener {
  private val recordsRead = new LongAdder
  private val recordsWritten = new LongAdder
  private val shuffleRead = new LongAdder
  private val shuffleWritten = new LongAdder
  private val cpuTimeNs = new LongAdder
  @volatile private var nextReport = reportEvery

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsRead.add(m.inputMetrics.recordsRead)
      recordsWritten.add(m.outputMetrics.recordsWritten)
      shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWritten.add(m.shuffleWriteMetrics.bytesWritten)
      cpuTimeNs.add(m.executorCpuTime)
      val r = recordsRead.sum()
      if (r >= nextReport) {
        nextReport = (r / reportEvery + 1) * reportEvery
        println(f"[graft-progress] ${r}%,d records read, " +
          f"${shuffleRead.sum() / 1048576}%,d MiB shuffled, " +
          f"${cpuTimeNs.sum() / 1e9}%.1f s cpu")
      }
    }
  }

  def report: Map[String, Long] = Map(
    "recordsRead" -> recordsRead.sum(),
    "recordsWritten" -> recordsWritten.sum(),
    "shuffleBytesRead" -> shuffleRead.sum(),
    "shuffleBytesWritten" -> shuffleWritten.sum(),
    "executorCpuNs" -> cpuTimeNs.sum())
}

object Progress {
  /** Run `body` with a progress listener attached; returns its result
    * plus the metric totals accumulated during the run. */
  def tracked[T](spark: SparkSession)(body: => T): (T, Map[String, Long]) = {
    val p = new Progress()
    spark.sparkContext.addSparkListener(p)
    try {
      val r = body
      // listener events are async; drain before snapshotting totals
      org.apache.spark.graftmetrics.drainListenerBus(spark.sparkContext)
      (r, p.report)
    } finally spark.sparkContext.removeSparkListener(p)
  }
}
