package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan of SparkEntry queries.
  * Usage: sbt "runMain graft.tools.Explain <sfDir> <q1,q2,...>" */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args.length < 2 || args(1) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
