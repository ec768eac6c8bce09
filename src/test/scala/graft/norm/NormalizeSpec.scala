package graft.norm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.OsmKind
import graft.pbf.PbfRead

/** The reference's master property (SURVEY.md §5): round-trip identity
  * through the normalized layer, with its exact relaxations. */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = "/root/reference/tests/fixtures/niue-230612.osm.pbf"
  private lazy val osm = PbfRead.read(spark, fixture).cache()

  test("demux produces the 10 apidb tables with consistent counts") {
    val db = Normalize.demux(osm)
    assert(db.nodes.count() == 41861)
    assert(db.ways.count() == 3014)
    assert(db.relations.count() == 125)
    // explode inverses: re-nested counts match
    assert(db.wayNodes.groupBy("way_id", "version").count().count() == 3014)
    assert(db.users.count() == db.users.select("uid").distinct().count())
    assert(db.changesets.count() ==
      osm.filter(_.changeset >= 0).map(_.changeset).distinct().count())
    // tag explode preserves multiplicity
    val nTagRows = db.nodeTags.count() + db.wayTags.count() + db.relationTags.count()
    val nTags = osm.map(_.tags.size).reduce(_ + _)
    assert(nTagRows == nTags)
  }

  test("round-trip identity: reassemble(demux(osm)) ≡ osm (0 diffs)") {
    val db = Normalize.demux(osm)
    val back = Normalize.reassemble(spark, db)
    assert(back.count() == osm.count())
    assert(Normalize.diffCount(osm, back) == 0)
  }

  test("diffCount detects a single perturbed element") {
    val db = Normalize.demux(osm)
    val back = Normalize.reassemble(spark, db)
    val perturbed = back.map(e =>
      if (e.kind == OsmKind.Node && e.id == 448768937L) e.copy(lat7 = e.lat7.map(_ + 1))
      else e)
    assert(Normalize.diffCount(osm, perturbed) == 1)
  }
}
