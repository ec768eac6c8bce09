package graft.tools

import graft._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.{AdminAreas, SpatialJoin}
import graft.pbf.PbfRead
import graft.synth.Pages
import graft.expr.{GeoFunctions => G}

object Profile {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("P_CORES", "32").toInt
    val n = sys.env.getOrElse("P_PAGES", "1000000").toLong
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val areas = AdminAreas.build(spark,
      PbfRead.read(spark, "/root/reference/tests/fixtures/niue-230612.osm.pbf")).cache()
    time("admin build")(areas.count())
    val cover = time("cover build") {
      val c = AdminAreas.coverTableDetailed(spark, areas, 17).cache(); c.count(); c
    }
    val pages = Pages.generate(spark, n)
    time("pages gen + count")(pages.count())
    time("geoparse only")(
      SpatialJoin.geoparsedPoints(pages).agg(sum(col("lat7"))).head())
    val pts = SpatialJoin.geoparsedPoints(pages)
    val polygons = areas.select(col("relationId").as("relation_id"), col("rings"))
    val joined = time("containment join") {
      val j = SpatialJoin.containmentJoin(spark, pts, cover, polygons, SpatialJoin.Params())
      println("joined rows: " + j.count()); j
    }
    time("tiles") {
      SpatialJoin.tiles(joined, 12).agg(sum(col("n_pages"))).head()
    }
    time("full run (join+tiles)") {
      val out = SpatialJoin.run(spark, pages, areas)
      out.tileCounts.count()
    }
    spark.stop()
  }
}
