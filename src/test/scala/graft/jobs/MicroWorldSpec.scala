package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geo.Geom
import graft.model.{OsmEntity, OsmKind, OsmMember, OsmTag}

/** Hand-built micro-OSM worlds (FIXTURES.md §3.2) for the cases the Niue
  * fixture can't exercise: history versions, deleted elements, holes,
  * multi-polygon relations, unclosed rings. */
class MicroWorldSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def node(id: Long, lat: Long, lon: Long, version: Int = 1,
      visible: Boolean = true) =
    OsmEntity(OsmKind.Node, id, version, visible, Some(lat), Some(lon),
      1000L, 1L, 1, "u", Nil, Nil, Nil)
  private def way(id: Long, refs: Seq[Long], version: Int = 1,
      visible: Boolean = true) =
    OsmEntity(OsmKind.Way, id, version, visible, None, None,
      1000L, 1L, 1, "u", Nil, refs, Nil)
  private def rel(id: Long, members: Seq[OsmMember], level: String = "8",
      version: Int = 1) =
    OsmEntity(OsmKind.Relation, id, version, visible = true, None, None,
      1000L, 1L, 1, "u",
      Seq(OsmTag("type", "boundary"), OsmTag("boundary", "administrative"),
        OsmTag("admin_level", level), OsmTag("name", s"rel$id")),
      Nil, members)

  test("history: assembly uses the LATEST visible way version") {
    // square; way v1 has wrong (partial) refs, v2 the correct closed ring
    val world = Seq(
      node(1, 0, 0), node(2, 0, 1000), node(3, 1000, 1000), node(4, 1000, 0),
      node(9, 500, 500), // admin_centre
      way(10, Seq(1, 2, 3), version = 1),
      way(10, Seq(1, 2, 3, 4, 1), version = 2),
      rel(100, Seq(OsmMember(1, 10, "outer"), OsmMember(0, 9, "admin_centre"))))
    val areas = AdminAreas.build(spark, world.toDS()).collect()
    assert(areas.length == 1 && areas.head.complete)
    assert(areas.head.rings.head.length == 8, "4-vertex ring from way v2")
  }

  test("deleted way (latest version invisible) leaves the relation incomplete") {
    val world = Seq(
      node(1, 0, 0), node(2, 0, 1000), node(3, 1000, 1000),
      way(10, Seq(1, 2, 3, 1), version = 1),
      way(10, Seq(1, 2, 3, 1), version = 2, visible = false),
      rel(100, Seq(OsmMember(1, 10, "outer"))))
    val areas = AdminAreas.build(spark, world.toDS()).collect()
    assert(areas.length == 1 && !areas.head.complete)
  }

  test("polygon with hole: inner role excludes interior points (even-odd)") {
    val world = Seq(
      node(1, 0, 0), node(2, 0, 10000), node(3, 10000, 10000), node(4, 10000, 0),
      node(5, 4000, 4000), node(6, 4000, 6000), node(7, 6000, 6000), node(8, 6000, 4000),
      node(9, 2000, 2000),
      way(10, Seq(1, 2, 3, 4, 1)),
      way(11, Seq(5, 6, 7, 8, 5)),
      rel(100, Seq(OsmMember(1, 10, "outer"), OsmMember(1, 11, "inner"),
        OsmMember(0, 9, "admin_centre"))))
    val a = AdminAreas.build(spark, world.toDS()).collect().head
    assert(a.complete && a.rings.length == 2)
    val rings = a.rings.map(_.toArray).toArray
    assert(Geom.pointInRings(2000, 2000, rings), "shell interior inside")
    assert(!Geom.pointInRings(5000, 5000, rings), "hole interior outside")
    // winding: outer CCW, inner CW
    assert(Geom.shoelace(rings(0))._1 > 0)
    assert(Geom.shoelace(rings(1))._1 < 0)
    // spatial join respects the hole
    val pages = Seq(
      ("hole-page", "point at 0.0005000, 0.0005000 end"),   // in hole
      ("shell-page", "point at 0.0002000, 0.0002000 end"))  // in shell
      .toDF("url", "text")
    val out = SpatialJoin.run(spark, pages
      .withColumn("warc_ts", org.apache.spark.sql.functions.current_timestamp())
      .withColumn("html", org.apache.spark.sql.functions.lit(Array[Byte]()))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en")),
      spark.createDataset(Seq(a)))
    val joined = out.joined.collect().map(_.getString(0)).toSet
    assert(joined == Set("shell-page"))
  }

  test("two disjoint outer rings form one multipolygon relation") {
    val world = Seq(
      node(1, 0, 0), node(2, 0, 1000), node(3, 1000, 1000), node(4, 1000, 0),
      node(5, 0, 50000), node(6, 0, 51000), node(7, 1000, 51000), node(8, 1000, 50000),
      way(10, Seq(1, 2, 3, 4, 1)), way(11, Seq(5, 6, 7, 8, 5)),
      rel(100, Seq(OsmMember(1, 10, "outer"), OsmMember(1, 11, "outer"))))
    val a = AdminAreas.build(spark, world.toDS()).collect().head
    assert(a.complete && a.rings.length == 2)
    val rings = a.rings.map(_.toArray).toArray
    assert(Geom.pointInRings(500, 500, rings)) // (lon,lat) in square 1
    assert(Geom.pointInRings(50500, 500, rings)) // in square 2
    assert(!Geom.pointInRings(25000, 500, rings)) // between the squares
  }

  test("unclosed ring is flagged, not silently dropped or closed") {
    val world = Seq(
      node(1, 0, 0), node(2, 0, 1000), node(3, 1000, 1000),
      way(10, Seq(1, 2, 3)), // open chain
      rel(100, Seq(OsmMember(1, 10, "outer"))))
    val a = AdminAreas.build(spark, world.toDS()).collect().head
    assert(!a.complete)
  }
}
