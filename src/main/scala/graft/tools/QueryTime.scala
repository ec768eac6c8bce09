package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time individual SparkEntry queries exactly the way Bench
  * does (local[N], count-only). Usage:
  *   sbt "runMain graft.tools.QueryTime <sfDir> <q1,q2,...>"
  * env: P_CORES (default 32). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cores = sys.env.getOrElse("P_CORES", "32").toInt
    val builder = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // P_CONF=key=value[,key=value...]: ad-hoc conf experiments
    sys.env.get("P_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // P_JOBS=1: per-job wall times + task counts (where do the seconds
    // of a multi-job gate actually go?)
    if (sys.env.contains("P_JOBS")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val descs =
            new java.util.concurrent.ConcurrentHashMap[Int, String]()
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(j.jobId,
              (System.nanoTime(), j.stageInfos.map(_.numTasks).sum))
            descs.put(j.jobId, Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""))
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(j.jobId)
            val d = Option(descs.remove(j.jobId)).getOrElse("")
            if (s != null)
              println(f"[qtime-job] job=${j.jobId} tasks=${s._2} " +
                f"${(System.nanoTime() - s._1) / 1e9}%.3f s  $d")
          }
        })
    }
    for (n <- names) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qtime] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
