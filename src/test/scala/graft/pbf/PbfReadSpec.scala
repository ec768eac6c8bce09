package graft.pbf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.OsmKind

class PbfReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = "/root/reference/tests/fixtures/niue-230612.osm.pbf"

  test("header probe: features and writing program (FIXTURES.md §1)") {
    val h = PbfRead.readHeader(spark, fixture)
    assert(h.requiredFeatures.toSet == Set("OsmSchema-V0.6", "DenseNodes"))
    assert(h.optionalFeatures.contains("Sort.Type_then_ID"))
    assert(h.writingProgram.startsWith("osmium"))
  }

  test("file-magic validation rejects non-PBF inputs (reference src/lib.rs:77-102)") {
    intercept[Exception](PbfRead.readHeader(spark, "/root/reference/tests/fixtures/text"))
    intercept[Exception](PbfRead.readHeader(spark, "/root/reference/tests/fixtures/empty"))
  }

  test("fixture decodes to exact reference counts: 41861 nodes / 3014 ways / 125 relations") {
    val ds = PbfRead.read(spark, fixture).cache()
    val counts = ds.groupBy("kind").count().collect()
      .map(r => r.getByte(0) -> r.getLong(1)).toMap
    assert(counts(OsmKind.Node) == 41861L)
    assert(counts(OsmKind.Way) == 3014L)
    assert(counts(OsmKind.Relation) == 125L)

    // extent matches the independently-decoded fixture bbox (FIXTURES.md §1)
    val ext = ds.filter($"kind" === OsmKind.Node)
      .agg(min("lat7"), max("lat7"), min("lon7"), max("lon7")).head()
    assert(ext.getLong(0) == -193548665L && ext.getLong(1) == -187534559L)
    assert(ext.getLong(2) == -1701595029L && ext.getLong(3) == -1695647229L)

    // the 14 admin relations + the 1 boundary-without-admin_level negative
    val rel = ds.filter($"kind" === OsmKind.Relation)
      .select($"id", explode($"tags").as("t"))
      .select($"id", $"t.k", $"t.v")
    // r3548694 has boundary=administrative but NO admin_level — the J1
    // predicate must therefore require admin_level presence to match the
    // golden 14-relation set
    val boundaries = rel.filter($"k" === "boundary" && $"v" === "administrative")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(boundaries == (1558543L to 1558556L).toSet + 3548694L)
    val withLevel = rel.filter($"k" === "admin_level")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(boundaries.intersect(withLevel) == (1558543L to 1558556L).toSet)

    // country relation has the admin_centre member node 448768937
    val niue = ds.filter($"kind" === OsmKind.Relation && $"id" === 1558556L).head()
    assert(niue.members.exists(m => m.role == "admin_centre" && m.ref == 448768937L))
    ds.unpersist()
  }

  test("way refs are ordered and resolve to existing nodes") {
    val ds = PbfRead.read(spark, fixture)
    val way = ds.filter($"kind" === OsmKind.Way).head()
    val refs = way.refs
    assert(refs.length >= 2)
    val nodeIds = ds.filter($"kind" === OsmKind.Node).select("id")
      .as[Long].collect().toSet
    assert(refs.forall(nodeIds.contains), "every way ref resolves")
  }
}
