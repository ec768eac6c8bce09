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
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qtime] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
