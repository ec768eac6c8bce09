package graft.tools

import org.apache.spark.sql.SparkSession
import graft.jobs.AdminAreas
import graft.model.{OsmEntity, OsmKind, OsmMember, OsmTag}

object Profile3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nRel = sys.env.getOrElse("P_NREL", "100").toInt
    val waysPerRel = 32
    val vertsPerWay = 4
    val entities = scala.collection.mutable.ArrayBuffer.empty[OsmEntity]
    val rnd = new scala.util.Random(42)
    for (r <- 0 until nRel) {
      val n = waysPerRel * vertsPerWay
      val cx = (r % 100) * 10000000L - 500000000L
      val cy = (r / 100) * 10000000L - 40000000L
      val ringIds = (0 until n).map(i => r * 100000L + i + 1)
      for ((nid, i) <- ringIds.zipWithIndex) {
        val ang = 2 * math.Pi * i / n
        val rad = 2000000L + rnd.nextInt(500000)
        entities += OsmEntity(OsmKind.Node, nid, 1, true,
          Some(cy + (rad * math.sin(ang)).toLong),
          Some(cx + (rad * math.cos(ang)).toLong), 0L, 1L, 1, "u", Nil, Nil, Nil)
      }
      for (w <- 0 until waysPerRel) {
        val from = w * vertsPerWay
        val refs = (from to from + vertsPerWay).map(i => ringIds(i % n))
        entities += OsmEntity(OsmKind.Way, r * 1000L + w + 1, 1, true, None, None,
          0L, 1L, 1, "u", Nil, refs, Nil)
      }
      entities += OsmEntity(OsmKind.Relation, 900000L + r, 1, true, None, None,
        0L, 1L, 1, "u",
        Seq(OsmTag("type", "boundary"), OsmTag("boundary", "administrative"),
          OsmTag("admin_level", "8"), OsmTag("name", s"r$r")),
        Nil, (0 until waysPerRel).map(w => OsmMember(1, r * 1000L + w + 1, "outer")))
    }
    val osm = entities.toSeq.toDS()
    var t0 = System.nanoTime()
    val admin = AdminAreas.adminRelations(osm)
    val chains = AdminAreas.initialChains(spark, osm, admin)
    println(f"[p3] initial chains: ${chains.count()} in ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val (closed, failed) = AdminAreas.assemble(spark, chains)
    println(f"[p3] assemble: closed=${closed.count()} failed=${failed.count()} in ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
