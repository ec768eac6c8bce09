package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.Replication
import graft.util.{QueryDef, Tables}

/** Streaming operators surfaced through the driver gate by running the
  * SAME aggregation code path in batch mode (semantically identical;
  * ReplicationSpec proves stream≡batch on the events table). */
object StreamingQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_window_agg",
      (s, d) =>
        Replication.windowedEventCounts(Tables.t(s, d, "events"))
          .select(unix_timestamp(col("w_start")).as("w_start_s"),
            col("event_type"), col("n"), col("sum_c"))
          .orderBy("w_start_s", "event_type"),
      Some("""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS w_start_s,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM events GROUP BY 1, 2 ORDER BY w_start_s, event_type""".stripMargin)),

    // a TRUE STREAMING gate (unlike the batch-form rows above, this one
    // executes Structured Streaming inside the gate): the duplicated
    // document corpus is staged as 4 ascending doc_id-range parquet
    // files with ascending mtimes, replayed one file per micro-batch
    // (AvailableNow) through streamingDedup's keyed state; the emitted
    // keeper set must equal DuckDB's min(doc_id)-per-fingerprint —
    // exact because batches ascend in doc_id, so the first batch
    // containing a fingerprint holds its global minimum.
    QueryDef(
      "q_stream_dedup",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val docsOf = (t: org.apache.spark.sql.DataFrame) =>
          t.select(col("doc_id"),
            graft.expr.TextFunctions.str_poly_hash(col("text")).as("fp"))
        val base = Tables.t(s, d, "documents")
        val corpus = docsOf(base).union(
          docsOf(base.filter(col("doc_id") % 11 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))))
        val dir = graft.util.Staging.dir("streamdedup", d)
        val marker = dir.resolve("_STAGED")
        if (!java.nio.file.Files.exists(marker)) {
          // ascending half-open ranges; bounds work at any SF (originals
          // sit below 2e6, the synthetic duplicates at +2e6)
          val splits = Seq(Long.MinValue, 125L, 250L, 2000000L, Long.MaxValue)
          for (i <- 0 until 4) {
            val part = corpus
              .filter(col("doc_id") >= splits(i) && col("doc_id") < splits(i + 1))
              .orderBy("doc_id").coalesce(1)
            val tmp = dir.resolve(s"_tmp-$i").toString
            part.write.mode("overwrite").parquet(tmp)
            val f = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
              .filter(p => p.getFileName.toString.startsWith("part-"))
              .findFirst().get()
            val dst = dir.resolve(f"b$i%02d.parquet")
            java.nio.file.Files.move(f, dst,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            // mtime IS the batch order for FileStreamSource; 10s apart
            // so coarse-grained filesystem timestamps cannot tie
            java.nio.file.Files.setLastModifiedTime(dst,
              java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
          }
          java.nio.file.Files.createFile(marker)
        }
        val stream = s.readStream.schema(corpus.schema)
          .option("maxFilesPerTrigger", "1")
          .option("latestFirst", "false")
          .parquet(dir.toString)
        val name = "q_stream_dedup_" +
          java.util.UUID.randomUUID().toString.replace("-", "")
        // the state-store partition count is frozen per streaming query
        // from shuffle.partitions at start; 4 micro-batches × 32 state
        // partitions of a few hundred rows each is pure task overhead,
        // so scope the stream (and only the stream) down to 4 — content
        // is partition-invariant, ReplicationSpec pins that
        val prev = s.conf.get("spark.sql.shuffle.partitions")
        val q = try {
          s.conf.set("spark.sql.shuffle.partitions", "4")
          graft.streaming.Replication.streamingDedup(s, stream)
            .writeStream.outputMode("append").format("memory")
            .queryName(name).trigger(Trigger.AvailableNow()).start()
        } finally s.conf.set("spark.sql.shuffle.partitions", prev)
        q.awaitTermination()
        s.table(name)
          .select(col("docId").as("doc_id"), col("fp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH c AS (SELECT doc_id, text FROM documents
             |  UNION ALL SELECT doc_id + 2000000, text
             |  FROM documents WHERE doc_id % 11 = 0),
             |f AS (SELECT doc_id,
             |  list_reduce(list_prepend(CAST(7 AS BIGINT),
             |    list_transform(regexp_split_to_array(text, ''),
             |      ch -> unicode(ch))), (a, b) -> (a * 31 + b) % 1000000007) AS fp
             |  FROM c)
             |SELECT min(doc_id) AS doc_id, fp FROM f
             |GROUP BY fp ORDER BY doc_id""".stripMargin)),

    // the streaming flagship's batch form (StreamingSpatialJoinSpec
    // proves stream ≡ batch): watermarked-window tile counts over the
    // fixture pipeline, gated as a frozen order-invariant digest like
    // the other fixture-derived geo queries
    QueryDef(
      "q_window_tiles",
      (s, _) => {
        val out = graft.streaming.StreamingSpatialJoin.windowedTiles(
          s, graft.synth.Pages.generate(s, 20000), Geo.prepared(s))
        out.agg(count(lit(1)).as("n"),
          expr("bit_xor(xxhash64(CAST(unix_timestamp(w_start) AS BIGINT), " +
            "z, x, y, relation_id, n_pages))").as("h"),
          sum(col("n_pages")).as("sum_pages"))
      },
      Some(GeoGolden.windowTilesSql))
  )
}
