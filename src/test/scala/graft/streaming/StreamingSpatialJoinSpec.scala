package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.jobs.{AdminAreas, SpatialJoin}
import graft.pbf.PbfRead
import graft.synth.Pages

/** Stream ≡ batch for the flagship pipeline: the SAME windowedTiles
  * function over a file stream of pages and over the batch DataFrame
  * must agree on every emitted window. */
class StreamingSpatialJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fixture = "/root/reference/tests/fixtures/niue-230612.osm.pbf"

  test("streaming windowed tiles ≡ batch on the same pages") {
    val areas = AdminAreas.build(spark, PbfRead.read(spark, fixture))
    val prep = SpatialJoin.prepare(spark, areas)
    val pages = Pages.generate(spark, 20000)
    val dir = Files.createTempDirectory("graft-stream-pages").toString
    // two files → two micro-batches, so the watermark actually advances
    pages.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
      .coalesce(1).write.parquet(s"$dir/in")
    pages.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(pages.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = StreamingSpatialJoin.windowedTiles(spark, stream, prep)
      .writeStream.outputMode("append").format("memory")
      .queryName("wintiles").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.sql("SELECT * FROM wintiles")
    val batch = StreamingSpatialJoin.windowedTiles(spark, pages, prep)
    // append mode emits only watermark-closed windows; every emitted
    // row must match the batch computation exactly
    assert(streamed.count() > 50, "stream must emit a real number of windows")
    val keys = Seq("w_start", "z", "x", "y", "relation_id")
    val joined = streamed.as("s").join(batch.as("b"), keys)
    assert(joined.count() == streamed.count(),
      "every streamed window exists in the batch result")
    assert(joined.filter(col("s.n_pages") =!= col("b.n_pages")).count() == 0,
      "per-window tile counts must agree")
  }
}
