package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmarks for the optimization rounds (guide §1.4) — the
  * frozen `graft.Bench` stays the driver contract; this main exists so
  * per-query timings can be re-measured quickly without the scaling
  * ladder. It replicates Bench's per-query methodology exactly: same
  * session config (local[$SPARK_GRAFT_CPUS], shuffle partitions =
  * cores, AQE on, UTC), same untimed throwaway warm-up list, then every
  * query timed by `.count()` in alphabetical order within one shared
  * session. Prints ONE JSON line {"queries": {...}, "total_query_sec": N}.
  *
  * Usage: sbt "runMain graft.BenchExtra [q1,q2,...]"
  *   - no args: full sweep (Bench-identical ordering)
  *   - with a comma list: only those queries (still after the warm-ups
  *     that Bench would run, filtered to the requested set's families)
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only: Option[Set[String]] =
      if (args.nonEmpty && args(0).nonEmpty) Some(args(0).split(",").toSet)
      else None

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // identical to Bench.scala's throwaway warm-up list
    val warmups = Seq("q_page_tiles", "q_dedup_minhash_lsh", "q_embed_ann_lsh",
      "q_embed_ann_ivf_recall", "q_embed_ann_ivfpq_recall", "q_page_knn",
      "q_multimodal", "q_stream_dedup", "q_stream_dedup_ttl",
      "q_admin_incremental", "q_extract", "q_knn_centres",
      "q_knn_centres_k", "q_osc_upsert",
      "q_vectorize", "q_warc_roundtrip", "q_warc_cdx")
    for (q <- warmups)
      try { SparkEntry.queries(q)(spark, sfDir).count() }
      catch { case _: Throwable => }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.sparkContext.setJobDescription(null)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"queries":$qs,"total_query_sec":${f"$total%.3f"}}""")
    spark.stop()
  }
}
