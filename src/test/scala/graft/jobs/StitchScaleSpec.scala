package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{OsmEntity, OsmKind, OsmMember, OsmTag}

/** Scale evidence for the iterative DataFrame self-join stitcher: a
  * synthetic admin world two orders of magnitude beyond the fixture
  * (1,000 relations, ~32 shuffled/reversed member ways each) must
  * assemble completely — the mutual-min loop converges in O(log ways)
  * rounds regardless of relation count because all relations merge in
  * the same joins. */
class StitchScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("1,000 relations x 32 ways stitch completely") {
    val nRel = 1000
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
    val t0 = System.nanoTime()
    val areas = AdminAreas.build(spark, entities.toSeq.toDS()).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"stitched $nRel relations in $secs%.1f s")
    assert(areas.length == nRel)
    val incomplete = areas.filterNot(_.complete)
    assert(incomplete.isEmpty, s"incomplete: ${incomplete.take(5).map(_.relationId).toSeq}")
    assert(areas.forall(_.rings.head.length == 2 * waysPerRel * vertsPerWay))
  }
}
