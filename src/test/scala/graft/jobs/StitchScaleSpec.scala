package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{OsmEntity, OsmKind, OsmMember, OsmTag}

/** Scale + equivalence evidence for the hybrid stitcher: a synthetic
  * admin world two orders of magnitude beyond the fixture (1,000
  * relations, ~32 shuffled/reversed member ways each) must assemble
  * completely on BOTH paths — the local flatMapGroups stitcher (the
  * default route) and the iterative random-mate self-join (the
  * oversized-relation route, forced via localMaxSegs = 0), and the two
  * must agree ring for ring. */
class StitchScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def world(nRel: Int, waysPerRel: Int): Seq[OsmEntity] = {
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
        val rad = 2000000L + (rnd.nextInt(500000))
        entities += OsmEntity(OsmKind.Node, nid, 1, visible = true,
          Some(cy + (rad * math.sin(ang)).toLong),
          Some(cx + (rad * math.cos(ang)).toLong),
          0L, 1L, 1, "u", Nil, Nil, Nil)
      }
      val ways = (0 until waysPerRel).map { w =>
        val from = w * vertsPerWay
        val refs = (from to from + vertsPerWay).map(i => ringIds(i % n))
        val (fr, id) = (refs, r * 1000L + w + 1)
        val reversed = if (rnd.nextBoolean()) fr.reverse else fr
        OsmEntity(OsmKind.Way, id, 1, visible = true, None, None,
          0L, 1L, 1, "u", Nil, reversed, Nil)
      }
      entities ++= rnd.shuffle(ways)
      entities += OsmEntity(OsmKind.Relation, 900000L + r, 1, visible = true,
        None, None, 0L, 1L, 1, "u",
        Seq(OsmTag("type", "boundary"), OsmTag("boundary", "administrative"),
          OsmTag("admin_level", "8"), OsmTag("name", s"r$r")),
        Nil, rnd.shuffle((0 until waysPerRel).toList)
          .map(w => OsmMember(1, r * 1000L + w + 1, "outer")))
    }
    entities.toSeq
  }

  private def summarize(areas: Array[AdminAreas.AdminArea]) =
    areas.sortBy(_.relationId)
      .map(a => (a.relationId, a.complete, a.rings.map(_.toList).toList)).toList

  test("1,000 relations x 32 ways stitch completely (local path)") {
    val waysPerRel = 32
    val entities = world(1000, waysPerRel)
    val t0 = System.nanoTime()
    val areas = AdminAreas.build(spark, entities.toDS()).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"stitched 1000 relations in $secs%.1f s (local path)")
    assert(areas.length == 1000)
    val incomplete = areas.filterNot(_.complete)
    assert(incomplete.isEmpty, s"incomplete: ${incomplete.take(5).map(_.relationId).toSeq}")
    assert(areas.forall(_.rings.head.length == 2 * waysPerRel * 4))
  }

  test("1,000 relations stitch completely on the iterative path and agree with local") {
    val entities = world(1000, 32)
    val t0 = System.nanoTime()
    val iter = AdminAreas.build(spark, entities.toDS(), localMaxSegs = 0).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"stitched 1000 relations in $secs%.1f s (iterative path)")
    assert(iter.length == 1000 && iter.forall(_.complete))
    val local = AdminAreas.build(spark, entities.toDS()).collect()
    assert(summarize(iter) == summarize(local),
      "iterative and local stitch paths must produce identical rings")
  }

  test("mixed world routes small groups local and big groups iterative, identically") {
    // even relations: 8 ways (local at threshold 16); odd: 32 ways (iterative)
    val entities = (0 until 20).flatMap { r =>
      world(1, if (r % 2 == 0) 8 else 32).map {
        case e if e.kind == OsmKind.Node => e.copy(id = e.id + r * 10000000L,
          lat7 = e.lat7.map(_ + r * 100L))
        case e if e.kind == OsmKind.Way => e.copy(id = e.id + r * 10000000L,
          refs = e.refs.map(_ + r * 10000000L))
        case e => e.copy(id = e.id + r * 100L,
          members = e.members.map(m => m.copy(ref = m.ref + r * 10000000L)))
      }
    }
    val hybrid = AdminAreas.build(spark, entities.toDS(), localMaxSegs = 16).collect()
    assert(hybrid.length == 20 && hybrid.forall(_.complete))
    val allLocal = AdminAreas.build(spark, entities.toDS()).collect()
    assert(summarize(hybrid) == summarize(allLocal))
  }
}
