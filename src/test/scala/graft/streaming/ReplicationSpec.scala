package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{OsmEntity, OsmKind}

class ReplicationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entity(kind: Byte, id: Long, version: Int,
      visible: Boolean = true): OsmEntity =
    OsmEntity(kind, id, version, visible, Some(0L), Some(0L), 0L, 1L, 1,
      "u", Nil, Nil, Nil)

  test("upsert-by-version keeps the max version across micro-batches") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val schema = spark.emptyDataset[OsmEntity].schema
    // batch 1: v1 of two nodes; batch 2: v2 of node 1 + stale v1 replay
    Seq(entity(OsmKind.Node, 1, 1), entity(OsmKind.Node, 2, 1))
      .toDS().write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/b*/")
    val q = Replication.upsertLatest(spark, stream.as[OsmEntity])
      .writeStream.outputMode("append").format("memory")
      .queryName("upserts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    Seq(entity(OsmKind.Node, 1, 2), entity(OsmKind.Node, 2, 1, visible = false))
      .toDS().write.parquet(s"$dir/b2")
    val q2 = Replication.upsertLatest(spark, stream.as[OsmEntity])
      .writeStream.outputMode("append").format("memory")
      .queryName("upserts2").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val out = spark.sql("SELECT id, max(version) v FROM upserts2 GROUP BY id ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq == Seq((1L, 2), (2L, 1)),
      "latest version per id wins; stale replay of (2,v1) emits nothing extra")
    val n1v2 = spark.sql("SELECT count(*) FROM upserts2 WHERE id=1 AND version=2").head().getLong(0)
    assert(n1v2 == 1)
  }

  test("applyDiffs resolves meta-identical ties deterministically (payload discriminator)") {
    // same (version, tsMillis, changeset) but different payloads — e.g.
    // a redacted element: the winner must not depend on reduceGroups'
    // pairing order. Run the reduction at several parallelism levels
    // and in both union orders; all must agree.
    val a = entity(OsmKind.Node, 1, 3).copy(user = "original",
      tags = Seq(graft.model.OsmTag("name", "x")))
    val b = a.copy(user = "redacted", tags = Nil)
    val expected =
      if (Ordering[(Boolean, Int)].gteq((a.visible, a.##), (b.visible, b.##))) a else b
    for (nPart <- Seq(1, 7); flip <- Seq(false, true)) {
      val (s1, s2) = if (flip) (Seq(b), Seq(a)) else (Seq(a), Seq(b))
      val got = Replication.applyDiffs(spark,
        s1.toDS().repartition(nPart), s2.toDS().repartition(nPart)).collect()
      assert(got.toSeq == Seq(expected), s"nPart=$nPart flip=$flip")
    }
    // a visible winner beats an invisible one at equal meta (visible
    // ranks first in the discriminator)
    val del = a.copy(visible = false, tags = Nil, user = "")
    val got2 = Replication.applyDiffs(spark, Seq(del).toDS(), Seq(a).toDS()).collect()
    assert(got2.toSeq == Seq(a))
  }

  test("streaming exact dedup emits one keeper per fingerprint across micro-batches") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    // batch 1: docs 1,2 distinct + doc 3 duplicating doc 1's fp
    Seq((1L, 100L), (3L, 100L), (2L, 200L)).toDF("doc_id", "fp")
      .coalesce(1).write.parquet(s"$dir/b1") // one file ⇒ one micro-batch
    val schema = Seq((1L, 1L)).toDF("doc_id", "fp").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/b*/")
    val q = Replication.streamingDedup(spark, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup1").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // batch 2: replays of both fps + one new fp
    Seq((4L, 100L), (5L, 200L), (6L, 300L)).toDF("doc_id", "fp")
      .coalesce(1).write.parquet(s"$dir/b2")
    val q2 = Replication.streamingDedup(spark, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup2").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val out = spark.sql("SELECT docId, fp FROM dedup2 ORDER BY fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // keeper per fp: smallest doc id in its first batch; replays ignored
    assert(out == Seq((1L, 100L), (2L, 200L), (6L, 300L)), s"got $out")
  }

  test("TTL'd streaming dedup: live state swallows replays, expired state re-emits") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-dedup-ttl").toString
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // batch 1: fp 7 first seen (t=0) + replay in-batch; fp 8 seen
    Seq((10L, 7L, ts(0)), (11L, 7L, ts(0)), (20L, 8L, ts(1)))
      .toDF("doc_id", "fp", "ts").coalesce(1).write.parquet(s"$dir/b1")
    // batch 2 (event time +10min, inside the 1h ttl): fp 7 replays —
    // swallowed; watermark advances to t=10min
    Seq((12L, 7L, ts(10))).toDF("doc_id", "fp", "ts")
      .coalesce(1).write.parquet(s"$dir/b2")
    // batch 3 (event time +3h): watermark jumps past every horizon;
    // batch 4 then re-presents fp 7 — state expired, re-emitted
    Seq((90L, 9L, ts(180))).toDF("doc_id", "fp", "ts")
      .coalesce(1).write.parquet(s"$dir/b3")
    Seq((13L, 7L, ts(181))).toDF("doc_id", "fp", "ts")
      .coalesce(1).write.parquet(s"$dir/b4")
    for ((b, i) <- Seq("b1", "b2", "b3", "b4").zipWithIndex) {
      val f = Files.list(java.nio.file.Paths.get(dir, b))
        .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
      val dst = java.nio.file.Paths.get(dir, f"in-$i%02d.parquet")
      Files.move(f, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
    }
    val schema = "doc_id BIGINT, fp BIGINT, ts TIMESTAMP"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Replication.streamingDedupTtl(spark, stream, ttlMs = 3600000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_ttl").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("dedup_ttl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // 10 kept (11 swallowed in-batch, 12 swallowed while live),
    // 13 RE-emitted after expiry, 20 and 90 first-seen
    assert(got == Seq((10L, 7L), (13L, 7L), (20L, 8L), (90L, 9L)), s"got=$got")
  }

  test("watermarked tumbling-window counts match the batch equivalent") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dir = Files.createTempDirectory("graft-events").toString
    events.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = Replication.windowedEventCounts(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("wincounts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // batch oracle: same aggregation without streaming
    val batch = Replication.windowedEventCounts(events)
    // append mode only emits windows below the watermark; every emitted
    // row must match the batch computation exactly
    val streamed = spark.sql("SELECT * FROM wincounts")
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("w_start", "event_type"))
    assert(streamed.count() > 0)
    assert(joined.filter(col("s.n") =!= col("b.n") ||
      col("s.sum_c") =!= col("b.sum_c")).count() == 0)
  }
}
