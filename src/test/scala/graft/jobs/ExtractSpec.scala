package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{OsmEntity, OsmKind}
import graft.pbf.{PbfRead, PbfWrite}

/** Regional extracts (reference roadmap v0.3): referential completeness
  * (no dangling way ref, no dangling relation member), complete-ways
  * node closure, relation clipping, and a write→read round trip of the
  * extracted sub-PBF. */
class ExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = "/root/reference/tests/fixtures/niue-230612.osm.pbf"
  private lazy val osm = PbfRead.read(spark, fixture).cache()

  private def check(ex: Seq[OsmEntity]): Unit = {
    val nodeIds = ex.filter(_.kind == OsmKind.Node).map(_.id).toSet
    val wayIds = ex.filter(_.kind == OsmKind.Way).map(_.id).toSet
    val relIds = ex.filter(_.kind == OsmKind.Relation).map(_.id).toSet
    assert(ex.map(e => (e.kind, e.id)).distinct.size == ex.size, "no duplicate elements")
    // complete ways: every ref of every kept way is a kept node
    for (w <- ex.filter(_.kind == OsmKind.Way); r <- w.refs)
      assert(nodeIds(r), s"way ${w.id} dangling node ref $r")
    // clipped relations: every surviving member's target is included
    for (rel <- ex.filter(_.kind == OsmKind.Relation); m <- rel.members) {
      val ok = m.mtype match {
        case OsmKind.Node => nodeIds(m.ref)
        case OsmKind.Way => wayIds(m.ref)
        case _ => relIds(m.ref)
      }
      assert(ok, s"relation ${rel.id} dangling member ${m.mtype}/${m.ref}")
    }
  }

  test("bbox extract: seeds + complete ways + clipped relations, counts pinned") {
    // Alofi-ish west-coast slice of Niue (degrees l,b,r,t):
    // -169.95,-19.08,-169.86,-19.02
    val ex = Extract.bbox(spark, osm,
      left = -1699500000L, bottom = -190800000L,
      right = -1698600000L, top = -190200000L).collect().toSeq
    check(ex)
    val nodes = ex.filter(_.kind == OsmKind.Node)
    val inBox = nodes.filter(n => n.lon7.get >= -1699500000L &&
      n.lon7.get <= -1698600000L && n.lat7.get >= -190800000L &&
      n.lat7.get <= -190200000L)
    assert(inBox.nonEmpty, "bbox must contain seed nodes")
    assert(nodes.size > inBox.size, "complete-ways closure must pull outside nodes")
    // every in-box visible node of the source is present (no seed lost)
    val srcInBox = osm.collect().filter(e => e.kind == OsmKind.Node && e.visible &&
      e.lon7.exists(v => v >= -1699500000L && v <= -1698600000L) &&
      e.lat7.exists(v => v >= -190800000L && v <= -190200000L)).map(_.id).toSet
    assert(inBox.map(_.id).toSet == srcInBox)
    // ways kept are exactly those touching a seed node
    val wayIds = ex.filter(_.kind == OsmKind.Way).map(_.id).toSet
    val expectWays = osm.collect().filter(e => e.kind == OsmKind.Way && e.visible &&
      e.refs.exists(srcInBox)).map(_.id).toSet
    assert(wayIds == expectWays)
    assert(ex.exists(_.kind == OsmKind.Relation), "coastal slice touches admin relations")
  }

  test("synthetic world: parent sweep keeps super-relations, clip drops dead members, versions resolve") {
    // the Niue fixture has no relation-member relations, so the parent
    // sweep needs a constructed case: r2 contains kept relation r1 (and
    // a dead node), r3 touches nothing
    import graft.model.{OsmMember, OsmTag}
    def node(id: Long, lat: Long, lon: Long, v: Int = 1, vis: Boolean = true) =
      OsmEntity(OsmKind.Node, id, v, vis, Some(lat), Some(lon),
        1000L + v, 1L, 1, "u", Nil, Nil, Nil)
    def way(id: Long, refs: Seq[Long]) =
      OsmEntity(OsmKind.Way, id, 1, visible = true, None, None,
        1000L, 1L, 1, "u", Nil, refs, Nil)
    def rel(id: Long, ms: Seq[OsmMember]) =
      OsmEntity(OsmKind.Relation, id, 1, visible = true, None, None,
        1000L, 1L, 1, "u", Seq(OsmTag("type", "collection")), Nil, ms)
    val world = Seq(
      node(1, 0, 0, v = 1),            // superseded version (old coords)
      node(1, 10, 10, v = 2),          // latest visible, inside bbox
      node(2, 5000, 5000),             // outside; pulled in via w1
      node(3, 6000, 6000),             // outside; never pulled
      node(4, 20, 20, v = 2, vis = false), // deleted inside bbox: excluded
      way(10, Seq(1L, 2L)),            // touches seed -> kept complete
      way(11, Seq(3L)),                // outside -> dropped
      rel(20, Seq(OsmMember(OsmKind.Way, 10L, "outer"),
        OsmMember(OsmKind.Way, 11L, "outer"))), // kept via w10; w11 clipped
      rel(21, Seq(OsmMember(OsmKind.Relation, 20L, "sub"),
        OsmMember(OsmKind.Node, 3L, "marker"))), // kept via PARENT SWEEP; n3 clipped
      rel(22, Seq(OsmMember(OsmKind.Way, 11L, "outer")))) // untouched -> dropped
    val ds = spark.createDataset(world)
    val ex = Extract.bbox(spark, ds, left = -100L, bottom = -100L,
      right = 100L, top = 100L).collect().toSeq
    check(ex)
    assert(ex.filter(_.kind == OsmKind.Node).map(_.id).sorted == Seq(1L, 2L))
    val n1 = ex.find(e => e.kind == OsmKind.Node && e.id == 1L).get
    assert(n1.version == 2 && n1.lat7.contains(10L), "latest visible version wins")
    assert(ex.filter(_.kind == OsmKind.Way).map(_.id) == Seq(10L))
    assert(ex.filter(_.kind == OsmKind.Relation).map(_.id).sorted == Seq(20L, 21L))
    val r20 = ex.find(e => e.kind == OsmKind.Relation && e.id == 20L).get
    assert(r20.members.map(_.ref) == Seq(10L), "dead way member clipped")
    val r21 = ex.find(e => e.kind == OsmKind.Relation && e.id == 21L).get
    assert(r21.members.map(m => (m.mtype, m.ref)) == Seq((OsmKind.Relation, 20L)),
      "super-relation kept by the parent sweep with only its live member")
  }

  test("relation extract (Alofi 1558549): polygon seeds, round trip, relation clip") {
    val ex = Extract.byRelation(spark, osm, 1558549L).cache()
    val rows = ex.collect().toSeq
    check(rows)
    val n = rows.count(_.kind == OsmKind.Node)
    val w = rows.count(_.kind == OsmKind.Way)
    val r = rows.count(_.kind == OsmKind.Relation)
    assert(n > 0 && w > 0 && r > 0, s"counts n=$n w=$w r=$r")
    // Alofi itself must survive, with its boundary ways intact
    val alofi = rows.find(e => e.kind == OsmKind.Relation && e.id == 1558549L)
      .getOrElse(fail("region relation itself must be extracted"))
    assert(alofi.members.nonEmpty)
    // a village extract is a strict subset of the island snapshot
    val total = osm.count()
    assert(rows.size < total, s"extract ${rows.size} must be < snapshot $total")
    // write → read round trip of the sub-PBF is element-identical
    val outPath = "/tmp/graft-test-extract.osm.pbf"
    PbfWrite.write(spark, ex, outPath, partitions = 2)
    val back = PbfRead.read(spark, outPath)
    assert(graft.norm.Normalize.diffCount(ex, back) == 0)
    assert(PbfRead.readHeader(spark, outPath).optionalFeatures
      .contains("Sort.Type_then_ID"))
  }
}
