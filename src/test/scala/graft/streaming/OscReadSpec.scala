package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.OsmKind

class OscReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val osc1 =
    """<?xml version='1.0' encoding='UTF-8'?>
      |<osmChange version="0.6" generator="test">
      |<create>
      |  <node id="1" version="1" timestamp="2023-06-12T20:21:33Z" changeset="10" uid="7" user="a&amp;b" lat="-19.0536391" lon="-169.8673418">
      |    <tag k="name" v="he said &quot;hi&quot; &lt;now&gt;"/>
      |  </node>
      |  <way id="2" version="1" timestamp="2023-06-12T20:21:34.250Z" changeset="10" uid="7" user="a">
      |    <nd ref="1"/><nd ref="3"/><nd ref="1"/>
      |    <tag k="highway" v="residential"/>
      |  </way>
      |  <relation id="5" version="1" timestamp="2023-06-12T20:21:35Z" changeset="11" uid="8" user="b">
      |    <member type="way" ref="2" role="outer"/>
      |    <member type="node" ref="1" role=""/>
      |  </relation>
      |</create>
      |</osmChange>
      |""".stripMargin

  private val osc2 =
    """<?xml version='1.0' encoding='UTF-8'?>
      |<osmChange version="0.6" generator="test">
      |<modify>
      |  <node id="1" version="2" timestamp="2023-06-13T00:00:00Z" changeset="12" uid="7" user="a&amp;b" lat="0.0000001" lon="179.9999999"/>
      |</modify>
      |<delete>
      |  <way id="2" version="2" timestamp="2023-06-13T00:00:01Z" changeset="12" uid="7" user="a"/>
      |</delete>
      |</osmChange>
      |""".stripMargin

  test("StAX parse: attributes, coords, tags, refs, members, escaping, deletes") {
    val es = OscRead.parse(new java.io.ByteArrayInputStream(osc1.getBytes("UTF-8")))
    assert(es.map(_.kind) == Seq(OsmKind.Node, OsmKind.Way, OsmKind.Relation))
    val n = es(0)
    assert(n.id == 1 && n.version == 1 && n.visible)
    assert(n.lat7.contains(-190536391L) && n.lon7.contains(-1698673418L))
    assert(n.tsMillis == 1686601293000L)
    assert(n.user == "a&b" && n.uid == 7 && n.changeset == 10)
    assert(n.tags.map(t => (t.k, t.v)) == Seq(("name", "he said \"hi\" <now>")))
    val w = es(1)
    assert(w.refs == Seq(1L, 3L, 1L)) // order + duplicates preserved
    assert(w.tsMillis == 1686601294250L) // fractional-second timestamp
    val r = es(2)
    assert(r.members.map(m => (m.mtype, m.ref, m.role)) ==
      Seq((OsmKind.Way, 2L, "outer"), (OsmKind.Node, 1L, "")))

    val d = OscRead.parse(new java.io.ByteArrayInputStream(osc2.getBytes("UTF-8")))
    assert(d.map(e => (e.kind, e.id, e.version, e.visible)) ==
      Seq((OsmKind.Node, 1L, 2, true), (OsmKind.Way, 2L, 2, false)))
    assert(d(1).lat7.isEmpty && d(1).tags.isEmpty && d(1).refs.isEmpty)
    // exact fixed-point: 0.0000001 → 1, 179.9999999 → 1799999999
    assert(d(0).lat7.contains(1L) && d(0).lon7.contains(1799999999L))
  }

  test("malformed structure fails loudly: entity outside an action block, unknown child") {
    val loose =
      """<?xml version='1.0'?><osmChange version="0.6">
        |  <node id="1" version="1" timestamp="2024-01-01T00:00:00Z"/>
        |</osmChange>""".stripMargin
    val e1 = intercept[java.io.IOException] {
      OscRead.parseBytes("loose.osc", loose.getBytes("UTF-8"))
    }
    assert(e1.getCause.getMessage.contains("outside a create/modify/delete"))
    val badChild =
      """<?xml version='1.0'?><osmChange version="0.6"><create>
        |  <node id="1" version="1" timestamp="2024-01-01T00:00:00Z" lat="0" lon="0">
        |    <bogus attr="1"/>
        |  </node>
        |</create></osmChange>""".stripMargin
    val e2 = intercept[java.io.IOException] {
      OscRead.parseBytes("bad.osc", badChild.getBytes("UTF-8"))
    }
    assert(e2.getCause.getMessage.contains("bogus"))
    // identity attributes may not default: a node missing id (or
    // version) would otherwise merge into (kind, 0) v0 downstream
    val noId =
      """<?xml version='1.0'?><osmChange version="0.6"><create>
        |  <node version="1" timestamp="2024-01-01T00:00:00Z" lat="0" lon="0"/>
        |</create></osmChange>""".stripMargin
    val e3 = intercept[java.io.IOException] {
      OscRead.parseBytes("noid.osc", noId.getBytes("UTF-8"))
    }
    assert(e3.getCause.getMessage.contains("missing attribute id"))
    val noVer =
      """<?xml version='1.0'?><osmChange version="0.6"><delete>
        |  <way id="9" timestamp="2024-01-01T00:00:00Z"/>
        |</delete></osmChange>""".stripMargin
    val e4 = intercept[java.io.IOException] {
      OscRead.parseBytes("nover.osc", noVer.getBytes("UTF-8"))
    }
    assert(e4.getCause.getMessage.contains("missing attribute version"))
    // XXE hardening: a DTD must be rejected, not resolved
    val xxe =
      """<?xml version='1.0'?><!DOCTYPE osmChange [<!ENTITY x SYSTEM "file:///etc/hostname">]>
        |<osmChange version="0.6"><create>
        |  <node id="1" version="1" timestamp="2024-01-01T00:00:00Z" lat="0" lon="0" user="&x;"/>
        |</create></osmChange>""".stripMargin
    intercept[java.io.IOException] {
      OscRead.parseBytes("xxe.osc", xxe.getBytes("UTF-8"))
    }
  }

  test("distributed read handles plain and gzipped files; bad XML fails loudly") {
    val dir = Files.createTempDirectory("graft-osc").toString
    Files.write(java.nio.file.Paths.get(dir, "a.osc"), osc1.getBytes("UTF-8"))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(osc2.getBytes("UTF-8")); gz.close()
    Files.write(java.nio.file.Paths.get(dir, "b.osc.gz"), bos.toByteArray)
    val es = OscRead.read(spark, dir).collect()
    assert(es.length == 5)
    assert(es.count(!_.visible) == 1)

    val err = intercept[java.io.IOException] {
      OscRead.parseBytes("x.osc", "<osmChange><node id=".getBytes)
    }
    assert(err.getMessage.contains("x.osc"))
  }

  test("apply-osc end-to-end: fixture snapshot + diffs -> new PBF snapshot") {
    val fixture = "/root/reference/tests/fixtures/niue-230612.osm.pbf"
    val snap = graft.pbf.PbfRead.read(spark, fixture)
    val someNode = snap.filter(e => e.kind == OsmKind.Node && e.visible).head()
    val someWay = snap.filter(e => e.kind == OsmKind.Way && e.visible).head()
    val dir = Files.createTempDirectory("graft-osc-apply").toString
    val osc =
      s"""<?xml version='1.0' encoding='UTF-8'?>
         |<osmChange version="0.6" generator="test">
         |<create>
         |  <node id="999999999" version="1" timestamp="2024-01-01T00:00:00Z" changeset="1" uid="1" user="u" lat="1.5" lon="2.5"/>
         |</create>
         |<modify>
         |  <node id="${someNode.id}" version="${someNode.version + 1}" timestamp="2024-01-01T00:00:00Z" changeset="1" uid="1" user="u" lat="3.5" lon="4.5"/>
         |</modify>
         |<delete>
         |  <way id="${someWay.id}" version="${someWay.version + 1}" timestamp="2024-01-01T00:00:00Z" changeset="1" uid="1" user="u"/>
         |</delete>
         |</osmChange>
         |""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "diff.osc"), osc.getBytes("UTF-8"))
    val out = Files.createTempDirectory("graft-osc-out").toString + "/new.osm.pbf"
    val updated = Replication.applyDiffs(spark, snap, OscRead.read(spark, dir))
    graft.pbf.PbfWrite.write(spark, updated, out, partitions = 2)
    val back = graft.pbf.PbfRead.read(spark, out).cache()
    // create landed
    val created = back.filter(_.id == 999999999L).collect()
    assert(created.length == 1 && created.head.lat7.contains(15000000L))
    // modify won by version
    val mod = back.filter(e => e.kind == OsmKind.Node && e.id == someNode.id).collect()
    assert(mod.length == 1 && mod.head.version == someNode.version + 1
      && mod.head.lat7.contains(35000000L))
    // delete dropped out
    assert(back.filter(e => e.kind == OsmKind.Way && e.id == someWay.id).isEmpty)
    // everything else untouched: +1 created node, -1 deleted way
    assert(back.count() == snap.filter(_.visible).count())
  }

  test("an .osc replayed through upsertLatest matches the batch latest-version oracle") {
    val dir = Files.createTempDirectory("graft-osc-stream").toString
    Files.write(java.nio.file.Paths.get(dir, "d1.osc"), osc1.getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(dir, "d2.osc"), osc2.getBytes("UTF-8"))
    // stream: one file per micro-batch, through the keyed upsert state
    val q = Replication.upsertLatest(spark,
        OscRead.readStream(spark, dir).coalesce(1))
      .writeStream.outputMode("append").format("memory")
      .queryName("osc_upserts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.sql(
      """SELECT kind, id, max(version) AS v,
        |  max_by(visible, version) AS vis
        |FROM osc_upserts GROUP BY kind, id ORDER BY kind, id""".stripMargin)
      .collect().map(r => (r.getByte(0), r.getLong(1), r.getInt(2), r.getBoolean(3))).toSeq
    // batch oracle: latest version per (kind, id) over ALL parsed rows
    val batch = OscRead.read(spark, dir)
      .groupByKey(e => (e.kind, e.id))
      .mapGroups((k, it) => {
        val best = it.maxBy(_.version)
        (k._1, k._2, best.version, best.visible)
      }).collect().sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch == Seq((OsmKind.Node, 1L, 2, true), (OsmKind.Way, 2L, 2, false),
      (OsmKind.Relation, 5L, 1, true)))
  }
}
