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
