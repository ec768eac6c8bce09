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
