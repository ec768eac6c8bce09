package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.expr.{GeoFunctions => G}
import graft.synth.Pages

object Profile2 {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("P_CORES", "32").toInt
    val n = sys.env.getOrElse("P_PAGES", "2000000").toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    println("defaultParallelism=" + spark.sparkContext.defaultParallelism)
    val pages = Pages.generate(spark, n)
    println("pages partitions=" + pages.rdd.getNumPartitions)
    time("range+hash only")(
      spark.range(0, n).select(xxhash64(col("id")).as("h")).agg(expr("bit_xor(h)")).head())
    time("gen count")(pages.count())
    time("gen text length sum")(pages.agg(sum(length(col("text")))).head())
    time("gen + geoparse")(pages.select(G.geoparse_packed(col("text")).as("p"))
      .agg(expr("bit_xor(p)")).head())
    val fixed = spark.range(0, n).select(
      concat(lit("page at -19.05"), (col("id") % 100), lit("321, -169.9123456 end")).as("text"))
    time("fixed text + geoparse")(fixed.select(G.geoparse_packed(col("text")).as("p"))
      .agg(expr("bit_xor(p)")).head())
    spark.stop()
  }
}
