package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.Replication
import graft.util.{QueryDef, Tables}

/** Streaming operators surfaced through the driver gate by running the
  * SAME aggregation code path in batch mode (semantically identical;
  * ReplicationSpec proves stream≡batch on the events table). */
object StreamingQueries {

  /** Stage `batches` as single-file parquets b00..bNN under a Staging
    * dir with ascending mtimes 10s apart (mtime IS the micro-batch
    * order for FileStreamSource; coarse filesystem timestamps cannot
    * tie), once per JVM (`_STAGED` marker). Returns the directory. */
  private def stageBatches(name: String, d: String,
      batches: Seq[org.apache.spark.sql.DataFrame]): java.nio.file.Path = {
    val dir = graft.util.Staging.dir(name, d)
    val marker = dir.resolve("_STAGED")
    if (!java.nio.file.Files.exists(marker)) {
      for ((part, i) <- batches.zipWithIndex) {
        val tmp = dir.resolve(s"_tmp-$i").toString
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        val listing = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        val f =
          try listing.filter(p => p.getFileName.toString.startsWith("part-"))
            .findFirst().get()
          finally listing.close()
        val dst = dir.resolve(f"b$i%02d.parquet")
        java.nio.file.Files.move(f, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
      }
      java.nio.file.Files.createFile(marker)
    }
    dir
  }

  /** Run a staged-file stream through `f` with the state-store
    * partition count scoped to 4 (frozen per query from
    * shuffle.partitions at start; 32 near-empty state partitions per
    * micro-batch are pure task overhead — content is
    * partition-invariant, ReplicationSpec pins that) and return the
    * memory-sink table. */
  private def runAvailableNow(s: org.apache.spark.sql.SparkSession,
      namePrefix: String, dir: java.nio.file.Path,
      schema: org.apache.spark.sql.types.StructType,
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(dir.toString)
    val name = namePrefix + "_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.util.Scoped.shufflePartitions(s, 4) {
      f(stream).writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination()
    s.table(name)
  }

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
        val docsOf = (t: org.apache.spark.sql.DataFrame) =>
          t.select(col("doc_id"),
            graft.expr.TextFunctions.str_poly_hash(col("text")).as("fp"))
        val base = Tables.t(s, d, "documents")
        val corpus = docsOf(base).union(
          docsOf(base.filter(col("doc_id") % 11 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))))
        // ascending half-open doc_id ranges; bounds work at any SF
        // (originals sit below 2e6, the synthetic duplicates at +2e6)
        val splits = Seq(Long.MinValue, 125L, 250L, 2000000L, Long.MaxValue)
        val dir = stageBatches("streamdedup", d, (0 until 4).map(i =>
          corpus.filter(col("doc_id") >= splits(i) && col("doc_id") < splits(i + 1))
            .orderBy("doc_id")))
        runAvailableNow(s, "q_stream_dedup", dir, corpus.schema,
          st => graft.streaming.Replication.streamingDedup(s, st))
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

    // BOUNDED-STATE TTL dedup as TRUE streaming (VERDICT r5 ask #3) —
    // the only dedup form that survives an unbounded stream. Four
    // event-time batches (one distinct ts per file, ascending):
    //   b0 t0       originals            → all emitted (first sight)
    //   b1 t0+60s   %7  dups (+2e6)      → swallowed (state live)
    //   b2 t0+300s  %13 dups (+4e6)      → swallowed (watermark lags
    //                                      one batch: wm=t0+60 < t0+ttl)
    //   b3 t0+360s  %11 dups (+6e6)      → RE-EMITTED (wm=t0+300 passed
    //                                      t0+ttl: state expired)
    //             ∪ %13 dups (+8e6)      → swallowed (SLIDING ttl: the
    //                                      swallowed b2 occurrence
    //                                      refreshed lastSeen to t0+300)
    // ttl=100s, watermark delay 0. Because ts ascend batch-by-batch and
    // lastSeen refreshes on EVERY occurrence, the keeper rule is exactly
    // row-local in SQL: emit an (fp,ts) group iff it has no previous
    // occurrence or prev_ts + ttl < wm, where wm = lag of the distinct
    // global ts sequence (= the stream's watermark when that batch ran).
    QueryDef(
      "q_stream_dedup_ttl",
      (s, d) => {
        val f = Tables.t(s, d, "documents").select(col("doc_id"),
          graft.expr.TextFunctions.str_poly_hash(col("text")).as("fp"))
        val t0 = 1000000000L
        def batch(df: org.apache.spark.sql.DataFrame, shift: Long, ts: Long) =
          df.select((col("doc_id") + shift).as("doc_id"), col("fp"),
            timestamp_seconds(lit(ts)).as("ts"))
        val b3 = batch(f.filter(col("doc_id") % 11 === 0), 6000000L, t0 + 360)
          .union(batch(f.filter(col("doc_id") % 13 === 0), 8000000L, t0 + 360))
        val batches = Seq(
          batch(f, 0L, t0),
          batch(f.filter(col("doc_id") % 7 === 0), 2000000L, t0 + 60),
          batch(f.filter(col("doc_id") % 13 === 0), 4000000L, t0 + 300),
          b3.orderBy("doc_id"))
        val dir = stageBatches("streamdedupttl", d, batches)
        runAvailableNow(s, "q_stream_dedup_ttl", dir, batches.head.schema,
          st => graft.streaming.Replication.streamingDedupTtl(
            s, st, ttlMs = 100000L, watermark = "0 seconds"))
          .select(col("docId").as("doc_id"), col("fp"),
            unix_timestamp(col("ts")).as("ts_s"))
          .orderBy("doc_id")
      },
      Some(s"""WITH f AS (SELECT doc_id,
             |  list_reduce(list_prepend(CAST(7 AS BIGINT),
             |    list_transform(regexp_split_to_array(text, ''),
             |      ch -> unicode(ch))), (a, b) -> (a * 31 + b) % 1000000007) AS fp
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, fp, 1000000000 AS ts FROM f
             |  UNION ALL SELECT doc_id + 2000000, fp, 1000000060 FROM f
             |    WHERE doc_id % 7 = 0
             |  UNION ALL SELECT doc_id + 4000000, fp, 1000000300 FROM f
             |    WHERE doc_id % 13 = 0
             |  UNION ALL SELECT doc_id + 6000000, fp, 1000000360 FROM f
             |    WHERE doc_id % 11 = 0
             |  UNION ALL SELECT doc_id + 8000000, fp, 1000000360 FROM f
             |    WHERE doc_id % 13 = 0),
             |o AS (SELECT fp, ts, min(doc_id) AS doc_id FROM c GROUP BY fp, ts),
             |w AS (SELECT ts, lag(ts) OVER (ORDER BY ts) AS wm
             |      FROM (SELECT DISTINCT ts FROM c)),
             |r AS (SELECT o.doc_id, o.fp, o.ts,
             |        lag(o.ts) OVER (PARTITION BY o.fp ORDER BY o.ts) AS prev_ts,
             |        w.wm
             |      FROM o JOIN w ON o.ts = w.ts)
             |SELECT doc_id, fp, CAST(ts AS BIGINT) AS ts_s FROM r
             |WHERE prev_ts IS NULL OR prev_ts + 100 < wm
             |ORDER BY doc_id""".stripMargin)),

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
