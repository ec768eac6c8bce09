package graft

import org.apache.spark.sql.SparkSession

import graft.jobs.{AdminAreas, SpatialJoin}
import graft.norm.Normalize
import graft.pbf.{PbfRead, PbfWrite}
import graft.synth.Pages

/** CLI mirroring the reference's executable surface
  * (/root/reference/src/bin/osm/main.rs: `osm import`, `osm export`)
  * plus the target-engine pipelines:
  *
  *   graft.Cli import <in.osm.pbf> <tablesDir>   pbf → 10 apidb parquet tables
  *   graft.Cli export <tablesDir> <out.osm.pbf>  tables → Type_then_ID pbf
  *   graft.Cli admin <in.osm.pbf> <outDir>       admin multipolygons + covers
  *   graft.Cli join <in.osm.pbf> <nPages> <outDir>  spatial join + knn + tiles
  */
object Cli {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val spark = session()
    val (_, metrics) = graft.util.Progress.tracked(spark) {
      args.toList match {
        case "import" :: in :: out :: Nil =>
          val db = Normalize.demux(PbfRead.read(spark, in))
          for ((name, df) <- Seq(
            "nodes" -> db.nodes, "node_tags" -> db.nodeTags,
            "ways" -> db.ways, "way_tags" -> db.wayTags,
            "way_nodes" -> db.wayNodes, "relations" -> db.relations,
            "relation_tags" -> db.relationTags,
            "relation_members" -> db.relationMembers,
            "users" -> db.users, "changesets" -> db.changesets))
            df.write.mode("overwrite").parquet(s"$out/$name")
          println(s"[graft] imported $in -> $out (10 tables)")
        case "export" :: in :: out :: Nil =>
          def t(n: String) = spark.read.parquet(s"$in/$n")
          val db = Normalize.ApiDb(t("nodes"), t("node_tags"), t("ways"),
            t("way_tags"), t("way_nodes"), t("relations"), t("relation_tags"),
            t("relation_members"), t("users"), t("changesets"))
          PbfWrite.write(spark, Normalize.reassemble(spark, db), out)
          println(s"[graft] exported $in -> $out")
        case "admin" :: in :: out :: Nil =>
          val areas = AdminAreas.build(spark, PbfRead.read(spark, in)).cache()
          areas.toDF().write.mode("overwrite").parquet(s"$out/admin_areas")
          AdminAreas.coverTable(spark, areas, 17).toDF()
            .write.mode("overwrite").parquet(s"$out/cover")
          println(s"[graft] ${areas.count()} admin areas -> $out")
        case "join" :: in :: n :: out :: Nil =>
          val areas = AdminAreas.build(spark, PbfRead.read(spark, in))
          val o = SpatialJoin.run(spark, Pages.generate(spark, n.toLong), areas)
          o.joined.write.mode("overwrite").parquet(s"$out/joined")
          o.knn.write.mode("overwrite").parquet(s"$out/knn")
          o.tileCounts.write.mode("overwrite").parquet(s"$out/tiles")
          println(s"[graft] join outputs -> $out")
        case other =>
          System.err.println(s"usage: import|export|admin|join ... (got: $other)")
          sys.exit(2)
      }
    }
    println(s"[graft] metrics: ${metrics.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    spark.stop()
  }
}
