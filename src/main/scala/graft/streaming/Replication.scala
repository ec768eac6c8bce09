package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.OsmEntity

/** Structured Streaming surface (SURVEY.md §2-H). The reference defers
  * replication sync to roadmap v0.2 (README.md:15-17) and only carries
  * the osmosis replication header fields; here the planned semantics are
  * implemented Spark-natively:
  *
  *  - `upsertLatest`: a stream of replication diffs (OsmEntity rows with
  *    increasing versions) keyed by (kind, id), `flatMapGroupsWithState`
  *    keeping the highest version — emits one row per update whenever
  *    the current winner changes (upsert-by-version).
  *  - `windowedEventCounts`: watermarked tumbling-window counts, the
  *    generic streaming aggregation smoke-tested on the events table.
  */
object Replication {

  final case class Upsert(kind: Byte, id: Long, version: Int, visible: Boolean)

  /** Keep the max-version row per (kind,id); emit on change. */
  def upsertLatest(spark: SparkSession, diffs: Dataset[OsmEntity]): Dataset[Upsert] = {
    import spark.implicits._
    diffs.groupByKey(e => (e.kind, e.id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Byte, Long), rows: Iterator[OsmEntity], state: GroupState[Int]) => {
          val prev = state.getOption.getOrElse(-1)
          val best = rows.maxBy(_.version)
          if (best.version > prev) {
            state.update(best.version)
            Iterator(Upsert(key._1, key._2, best.version, best.visible))
          } else Iterator.empty
        })
  }

  /** BATCH replication apply: snapshot + parsed .osc diffs → the new
    * snapshot (one map-side-combined reduce per (kind, id), highest
    * version wins; deletes — visible=false winners — drop out, exactly
    * like a non-historical extract). Ties (same version) break on
    * (tsMillis, changeset), then — because reduceGroups pairs operands
    * in nondeterministic order — on a FINAL deterministic discriminator
    * over the payload itself (visible flag, then a structural hash), so
    * even a meta-identical pair with different payloads (e.g. a
    * redacted element) resolves to the same winner at any parallelism.
    * Pairs with [[OscRead.read]] on one side and
    * [[graft.pbf.PbfWrite.write]] on the other for the end-to-end
    * `apply-osc` CLI path. */
  def applyDiffs(spark: SparkSession, snapshot: Dataset[OsmEntity],
      diffs: Dataset[OsmEntity]): Dataset[OsmEntity] = {
    import spark.implicits._
    snapshot.union(diffs)
      .groupByKey(e => (e.kind, e.id))
      .reduceGroups { (a, b) =>
        // case-class structural hash: MurmurHash3 over primitives,
        // Strings and Seqs — deterministic across JVMs/executors
        val ka = (a.version, a.tsMillis, a.changeset, a.visible, a.##)
        val kb = (b.version, b.tsMillis, b.changeset, b.visible, b.##)
        if (Ordering[(Int, Long, Long, Boolean, Int)].gteq(ka, kb)) a else b
      }
      .map(_._2)
      .filter(_.visible)
  }

  final case class DedupDoc(docId: Long, fp: Long)

  /** Streaming exact dedup for a document stream (training-data
    * pipeline op): keyed on the text fingerprint, emits only the FIRST
    * document carrying each fingerprint; later copies are swallowed by
    * the keyed state. State per key is one boolean — at 100 TB the
    * state store shards by fingerprint across executors, the same
    * contract as the batch hash-groupBy dedup (q_dedup_exact). Input:
    * (doc_id BIGINT, fp BIGINT) — fingerprint with str_poly_hash. */
  def streamingDedup(spark: SparkSession, docs: DataFrame): Dataset[DedupDoc] = {
    import spark.implicits._
    docs.select(col("doc_id").as("docId"), col("fp")).as[DedupDoc]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[DedupDoc], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic keeper within a batch: smallest doc id
            Iterator(rows.minBy(_.docId))
          }
        })
  }

  final case class DedupDocTs(docId: Long, fp: Long, ts: java.sql.Timestamp)

  /** BOUNDED-STATE streaming dedup — the form that survives an
    * unbounded 100 TB stream: state per fingerprint expires on an
    * EVENT-TIME timeout once the watermark passes lastSeen + ttl, so
    * total state is O(distinct fingerprints within the ttl horizon),
    * not O(all history). Semantics: a duplicate arriving while its
    * fingerprint's state is live is swallowed; after expiry the next
    * occurrence is emitted again (the standard TTL'd-dedup contract —
    * exact dedup within the horizon, best-effort beyond it). Input:
    * (doc_id BIGINT, fp BIGINT, ts TIMESTAMP event time). */
  def streamingDedupTtl(spark: SparkSession, docs: DataFrame,
      ttlMs: Long = 3600000L, watermark: String = "0 seconds"): Dataset[DedupDocTs] = {
    import spark.implicits._
    docs.select(col("doc_id").as("docId"), col("fp"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[DedupDocTs]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, rows: Iterator[DedupDocTs], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            // watermark passed lastSeen + ttl with no new data: forget
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val newest = batch.map(_.ts.getTime).max
            // the timeout callback only fires for DATA-LESS groups, so
            // a fingerprint that receives data after its horizon must
            // detect expiry itself against the current watermark
            val live = state.exists &&
              state.get + ttlMs >= state.getCurrentWatermarkMs()
            val out =
              if (live) Iterator.empty
              else Iterator(batch.minBy(d => (d.docId, d.ts.getTime)))
            // refresh the horizon from the newest occurrence either way
            // (sliding ttl); the timeout must stay above the watermark
            // or the API rejects it (late rows can otherwise place it
            // in the past)
            state.update(math.max(state.getOption.getOrElse(0L), newest))
            state.setTimeoutTimestamp(
              math.max(state.get + ttlMs, state.getCurrentWatermarkMs() + 1))
            out
          }
        })
  }

  /** Watermarked tumbling-window counts over an event stream with
    * (ts TIMESTAMP, event_type STRING, value DOUBLE). */
  def windowedEventCounts(events: DataFrame,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ parquet → event time
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("sum_c"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_c"))
}
