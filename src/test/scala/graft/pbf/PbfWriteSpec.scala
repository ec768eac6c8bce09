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

  test("pbf write → read round trip is element-identical (0 diffs, directory form)") {
    val osm = PbfRead.read(spark, fixture).cache()
    val outPath = "/tmp/graft-test-roundtrip.osm.pbf"
    PbfWrite.write(spark, osm, outPath, partitions = 4)
    // DEFAULT output is a DIRECTORY of frame-concatenable parts: header
    // in part-00000, one part per task — no driver-side byte concat
    val parts = new java.io.File(outPath).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 5, "header part + 4 task parts")
    val h = PbfRead.readHeader(spark, outPath)
    assert(h.requiredFeatures.contains("OsmSchema-V0.6"))
    assert(h.optionalFeatures.contains("Sort.Type_then_ID"))
    val back = PbfRead.read(spark, outPath).cache()
    assert(back.count() == osm.count())
    assert(Normalize.diffCount(osm, back) == 0)
    val ids = parts.map(p =>
      PbfRead.scanFrames(spark, p.getPath).count(_.blobType == "OSMData")).sum
    assert(ids >= 4, "multiple data blocks written")
  }

  test("--single-file concat form is one plain file, identical content") {
    val osm = PbfRead.read(spark, fixture).cache()
    val outPath = "/tmp/graft-test-roundtrip-single.osm.pbf"
    PbfWrite.write(spark, osm, outPath, partitions = 4, singleFile = true)
    val f = new java.io.File(outPath)
    assert(f.isFile, "single-file mode must produce one plain file")
    assert(!new java.io.File(outPath + ".staging").exists(), "staging dir removed")
    assert(!new java.io.File(outPath + ".commit").exists(),
      "concat temp renamed over the destination, not left behind")
    assert(PbfRead.readHeader(spark, outPath).optionalFeatures
      .contains("Sort.Type_then_ID"))
    assert(Normalize.diffCount(osm, PbfRead.read(spark, outPath)) == 0)
  }

  test("a failed export leaves the previous output intact and no staging behind") {
    val osm = PbfRead.read(spark, fixture).cache()
    val outPath = "/tmp/graft-test-failed-export.osm.pbf"
    PbfWrite.write(spark, osm, outPath, partitions = 2)
    val before = Normalize.diffCount(osm, PbfRead.read(spark, outPath))
    assert(before == 0)
    // an export whose tasks throw mid-write must not clobber outPath
    val poisoned = osm.map { e =>
      if (e.kind == OsmKind.Way) throw new RuntimeException("boom")
      e
    }
    intercept[Exception] {
      PbfWrite.write(spark, poisoned, outPath, partitions = 2)
    }
    assert(!new java.io.File(outPath + ".staging").exists(),
      "failed staging dir swept")
    assert(Normalize.diffCount(osm, PbfRead.read(spark, outPath)) == 0,
      "previous committed output must survive a failed export")
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
