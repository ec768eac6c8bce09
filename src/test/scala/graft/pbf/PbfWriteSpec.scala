package graft.pbf

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.OsmKind
import graft.norm.Normalize

/** Export-side round trip (reference export-test semantics): read the
  * fixture, write our own PBF, read it back — must be element-identical
  * and declare the same header features. */
class PbfWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixture = "/root/reference/tests/fixtures/niue-230612.osm.pbf"

  test("pbf write → read round trip is element-identical (0 diffs)") {
    val osm = PbfRead.read(spark, fixture).cache()
    val outPath = "/tmp/graft-test-roundtrip.osm.pbf"
    PbfWrite.write(spark, osm, outPath, partitions = 4)
    val h = PbfRead.readHeader(spark, outPath)
    assert(h.requiredFeatures.contains("OsmSchema-V0.6"))
    assert(h.optionalFeatures.contains("Sort.Type_then_ID"))
    val back = PbfRead.read(spark, outPath).cache()
    assert(back.count() == osm.count())
    assert(Normalize.diffCount(osm, back) == 0)
    // Type_then_ID order verified within the re-read stream
    val kinds = back.select("kind").collect().map(_.getByte(0))
    // file frame order == partition order; decode preserves it per blob
    val ids = PbfRead.scanFrames(spark, outPath).count(_.blobType == "OSMData")
    assert(ids >= 4, "multiple data blocks written")
  }

  test("full chain: pbf → apidb tables → reassemble → pbf → read ≡ original") {
    val osm = PbfRead.read(spark, fixture)
    val back = Normalize.reassemble(spark, Normalize.demux(osm))
    val outPath = "/tmp/graft-test-chain.osm.pbf"
    PbfWrite.write(spark, back, outPath, partitions = 3)
    val reread = PbfRead.read(spark, outPath)
    assert(Normalize.diffCount(osm, reread) == 0)
  }
}
