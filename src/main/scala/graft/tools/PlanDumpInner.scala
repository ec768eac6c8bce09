package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted plan of operator fragments that run
  * EAGERLY inside gates (behind localCheckpoint), which
  * graft.tools.Explain therefore shows only as a Scan ExistingRDD.
  * Usage: sbt "runMain graft.tools.PlanDumpInner <diff|substr> [sfDir]" */
object PlanDumpInner {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "diff"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    which match {
      case "diff" =>
        // the stream-equality comparator inside the roundtrip gates
        val osm = graft.queries.OsmQueries.historyFixture(spark)
        graft.norm.Normalize.diffFrame(osm, osm).explain("formatted")
      case "substr" =>
        // the duplicated-shingle election inside q_substr_dedup/_trim
        graft.queries.TextOps.substrDupStartsFrame(spark, sfDir)
          .explain("formatted")
      case other => sys.error(s"unknown fragment: $other")
    }
    spark.stop()
  }
}
