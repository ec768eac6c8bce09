package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.expr.EmbedFunctions
import graft.util.{QueryDef, Tables}

/** Embedding similarity search (training-data ops).
  *
  * THE DEFAULT API IS [[annTopK]] — LSH-bucketed ANN with deterministic
  * per-bucket caps, the only form that survives 10^9+ vectors. The
  * brute-force form ([[bruteTopK]]) is a deliberately quadratic
  * CORRECTNESS BASELINE kept for the oracle gates; it `collect()`s the
  * corpus to the driver and is bounded here to a deterministic fixture
  * slice (vec_id % 4 == 0) so no full-table quadratic scan runs in the
  * default bench path.
  *
  * Exactness strategy (so every query carries a full DuckDB oracle):
  * vectors are quantized once to int64 (round(x*1000)) and every
  * comparison key is integer-derived: the ranking key is
  * sign(dot)·dot²/(|a|²·|b|²), whose numerator and denominator are
  * exact integers < 2^53, so the single double division is bit-identical
  * across engines.
  */
object Similarity {

  private val quantize =
    (c: Column) => transform(c, x => round(x.cast("double") * 1000, 0).cast("long"))

  /** Quantized corpus (vec_id, q, qq) with zero vectors dropped — the
    * operator's defined domain. */
  def corpusQ(emb: DataFrame): DataFrame =
    emb.withColumn("qq", aggregate(transform(col("q"), x => x * x),
        lit(0L), (a, v) => a + v))
      .filter(col("qq") > 0)

  /** Integer-jittered twin per vector (+1e6 id): makes recall a
    * measurable property of any corpus (twin angle θ ≈ 0.005 rad). */
  def twins(base: DataFrame): DataFrame =
    // NOTE: jitter must key on the ORIGINAL id. Both Spark (lateral
    // column alias) and DuckDB resolve a same-named alias in the same
    // select list, so the original id gets its own name first.
    base.withColumnRenamed("vec_id", "ovid")
      .select((col("ovid") + 1000000L).as("vec_id"),
        transform(col("q"),
          (x, i) => x + pmod(col("ovid") * 31 + i, lit(7)) - 3).as("q"))

  /** DEFAULT nearest-neighbour API — the 100 TB path. 4 LSH tables ×
    * 16 random-hyperplane bits (codegen kernel; 65,536 buckets per
    * table), deterministic per-bucket caps bounding the within-bucket
    * join at ANY scale, exact quantized-cosine refine, top-k per
    * vector. Input: corpusQ output. Output: (vec_id, rk, ann_id).
    *
    * The fused k=1 bucket self-join BUILD side is the capped bands
    * table (≈ 4·n rows WITH vectors, derived through a Generate whose
    * stats Catalyst underestimates): its broadcast is kept only while
    * one cheap corpus count stays under `broadcastMaxRows` and
    * otherwise degrades deterministically to shuffled-hash
    * ([[graft.util.Joins.boundedBroadcast]]) — a forced broadcast of a
    * 10^9-vector band table is the same unbounded-broadcast failure the
    * kNN probe fixed in round 4. The count makes this method eager. */
  /** LSH-bucketed corpus with the deterministic per-bucket cap —
    * bounds every within-bucket join at ANY scale (inert at test
    * scale — buckets are tiny). Shared by [[annTopK]] and
    * [[embedDedupPairs]]. */
  private def cappedBands(corpus: DataFrame, cap: Int): DataFrame = {
    val keyed = corpus
      .select(col("vec_id"), col("q"), col("qq"),
        posexplode(EmbedFunctions.lsh_buckets(col("q"))))
      .select(col("vec_id"), col("q"), col("qq"),
        col("pos").as("t"), col("col").as("bucket"))
    val wCap = Window.partitionBy("t", "bucket")
      .orderBy(pmod(col("vec_id") * 2654435761L, lit(1000000007L)), col("vec_id"))
    keyed.withColumn("rn", row_number().over(wCap))
      .filter(col("rn") <= cap).drop("rn")
  }

  def annTopK(corpus: DataFrame, k: Int = 1, cap: Int = 1024,
      broadcastMaxRows: Long = 1000000L): DataFrame = {
    val nEst = 4L * corpus.count()
    val capped = cappedBands(corpus, cap)
    val den = col("qqa").cast("double") * col("qqb").cast("double")
    val num = col("dot").cast("double") * col("dot").cast("double")
    def score(pairs: DataFrame): DataFrame = pairs
      .withColumn("dot", aggregate(zip_with(col("qa"), col("qb"),
        (x, y) => x * y), lit(0L), (a, v) => a + v))
      .withColumn("key", when(col("dot") < 0, -(num / den)).otherwise(num / den))
    if (k == 1) {
      // fused top-1: score directly on the bucket join (vectors ride the
      // cap shuffle) and aggregate the argmin — a pair found by several
      // tables rescans identically (≤ 4×, cheap) instead of paying the
      // distinct + two corpus re-joins + rank window of the general path
      val scored = score(capped
        .select(col("t"), col("bucket"), col("vec_id").as("a_id"),
          col("q").as("qa"), col("qq").as("qqa"))
        .join(graft.util.Joins.boundedBroadcast(
          capped.select(col("t"), col("bucket"), col("vec_id").as("b_id"),
            col("q").as("qb"), col("qq").as("qqb")),
          nEst, broadcastMaxRows), Seq("t", "bucket"))
        .filter(col("a_id") =!= col("b_id")))
      scored.groupBy(col("a_id"))
        .agg(min(struct(negate(col("key")), col("b_id"))).as("m"))
        .select(col("a_id").as("vec_id"), lit(1).as("rk"),
          col("m.b_id").as("ann_id"))
    } else {
      val thin = capped.select("t", "bucket", "vec_id")
      val pairs = thin.select(col("t"), col("bucket"), col("vec_id").as("a_id"))
        .join(graft.util.Joins.boundedBroadcast(
          thin.select(col("t"), col("bucket"), col("vec_id").as("b_id")),
          nEst, broadcastMaxRows), Seq("t", "bucket"))
        .filter(col("a_id") =!= col("b_id"))
        .select("a_id", "b_id").distinct()
      val qtab = corpus.select(col("vec_id"), col("q"), col("qq"))
      val scored = score(pairs
        .join(qtab.select(col("vec_id").as("a_id"), col("q").as("qa"),
          col("qq").as("qqa")), "a_id")
        .join(qtab.select(col("vec_id").as("b_id"), col("q").as("qb"),
          col("qq").as("qqb")), "b_id"))
      val w = Window.partitionBy("a_id").orderBy(col("key").desc, col("b_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select(col("a_id").as("vec_id"), col("rk"), col("b_id").as("ann_id"))
    }
  }

  /** IVF (inverted-file) nearest neighbour — the second ANN family
    * beside [[annTopK]]'s LSH, with a DATA-DEPENDENT k-means coarse
    * quantizer:
    *  - the quantizer TRAINS ON A BOUNDED SAMPLE, never the corpus:
    *    a deterministic modulus keeps ≈ sampleTarget·kSeeds vectors
    *    (m = max(1, n div (sampleTarget·kSeeds)); vec_id % m == 0), so
    *    Lloyd cost is O(sample·kSeeds·dim) — independent of corpus
    *    size — while the final assignment stays a single full pass;
    *  - kSeeds initial centroids picked by a deterministic rule
    *    (smallest ids with vec_id % 7 == 1 — no RNG, a scalable
    *    TakeOrdered), then `lloydIters` Lloyd iterations with
    *    integer-exact centroid means, so the DuckDB oracle reproduces
    *    the TRAINED index bit-for-bit;
    *  - assignment is MAP-ONLY: the centroid table is driver-bounded
    *    (kSeeds rows), so each pass ships the flattened matrix as a
    *    codegen reference object and ranks it per row with the ivf_top
    *    kernel (one tight primitive loop — exact integer L2, ties →
    *    the smallest sid) instead of exploding n×kSeeds rows through a
    *    crossJoin + window (which a 10^9-vector corpus cannot afford).
    *    Per Lloyd iteration the only shuffle is the tiny per-dimension
    *    partial agg for the new means (sum div count — both engines
    *    truncate toward zero; empty clusters drop out identically).
    *  - probe side joins assignment side on the seed id (list-bucketed
    *    equi-join, candidate count ≈ nProbe · n/kSeeds per query —
    *    kSeeds scales with n at 100 TB, keeping lists near-constant),
    *    scored by the same exact quantized-cosine key as the LSH path.
    *    The assignment BUILD side is the FULL corpus (one row per
    *    vector, with its vector) behind a Generate, so its broadcast is
    *    bounded by `broadcastMaxRows` with the deterministic
    *    shuffled-hash degrade ([[graft.util.Joins.boundedBroadcast]]).
    * Output: (vec_id, ann_id). */
  /** Trained coarse quantizer (shared by [[ivfTop1]] and
    * [[ivfPqTop1]]): deterministic seeds + `lloydIters` Lloyd rounds
    * over the bounded modulus sample, each round one map-only
    * assignment (ivf_top kernel) + one tiny per-dimension partial agg.
    * Returns (sid, centroid) sorted by sid. */
  private def coarseCentroids(corpus: DataFrame, n: Long, kSeeds: Int,
      lloydIters: Int, sampleTarget: Int): Seq[(Long, Seq[Long])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = math.max(1L, n / (sampleTarget.toLong * kSeeds))
    val sample = corpus.filter(pmod(col("vec_id"), lit(m)) === 0)
      .select(col("vec_id"), col("q"))
    var centroids: Seq[(Long, Seq[Long])] = corpus
      .filter(pmod(col("vec_id"), lit(7)) === 1)
      .orderBy("vec_id").limit(kSeeds)
      .select(col("vec_id"), col("q")).as[(Long, Seq[Long])].collect().toSeq
    require(centroids.nonEmpty, "IVF needs at least one seed centroid")
    def topSids(nP: Int): Column = EmbedFunctions.ivf_top(col("q"),
      centroids.flatMap(_._2).toArray, centroids.map(_._1).toArray, nP)
    for (_ <- 1 to lloydIters) {
      val assigned = sample.select(
        get(topSids(1), lit(0)).as("sid"), col("q"))
      centroids = assigned.select(col("sid"), posexplode(col("q")))
        .groupBy("sid", "pos")
        .agg(expr("sum(col) div count(1)").as("v"))
        .groupBy("sid")
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("v")))),
          s => s.getField("v")).as("sq"))
        .as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    }
    centroids
  }

  def ivfTop1(corpus: DataFrame, kSeeds: Int = 256, nProbe: Int = 2,
      lloydIters: Int = 2, sampleTarget: Int = 100,
      broadcastMaxRows: Long = 1000000L): DataFrame = {
    // one cheap count sizes the deterministic training sample
    val n = corpus.count()
    val centroids = coarseCentroids(corpus, n, kSeeds, lloydIters, sampleTarget)
    // per-row centroid ranking via the ivf_top codegen kernel (d2 asc,
    // sid asc — the same tie rule as the oracle's window); the matrix
    // rides as a driver-constant reference object
    def topSids(nP: Int): Column = EmbedFunctions.ivf_top(col("q"),
      centroids.flatMap(_._2).toArray, centroids.map(_._1).toArray, nP)
    // final pass over the FULL corpus: top-nProbe centroids per row in
    // one map-only projection; rn = 1 is the inverted-list assignment
    val withTop = corpus.select(col("vec_id"), col("q"), col("qq"),
        posexplode(topSids(nProbe)))
      .select(col("vec_id"), col("q"), col("qq"),
        (col("pos") + 1).as("rn"), col("col").as("sid"))
    val assign = withTop.filter(col("rn") === 1)
      .select(col("sid"), col("vec_id").as("b_id"),
        col("q").as("qb"), col("qq").as("qqb"))
    val probe = withTop
      .select(col("sid"), col("vec_id").as("a_id"),
        col("q").as("qa"), col("qq").as("qqa"))
    // a pair reachable through both probes scores identically twice —
    // the argmin absorbs duplicates, cheaper than a distinct (same
    // trade as the fused LSH k=1 path)
    val scored = probe
      .join(graft.util.Joins.boundedBroadcast(assign, n, broadcastMaxRows),
        Seq("sid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("dot", EmbedFunctions.vec_dot(col("qa"), col("qb")))
      .withColumn("key", {
        val den = col("qqa").cast("double") * col("qqb").cast("double")
        val num = col("dot").cast("double") * col("dot").cast("double")
        when(col("dot") < 0, -(num / den)).otherwise(num / den)
      })
    scored.groupBy(col("a_id"))
      .agg(min(struct(negate(col("key")), col("b_id"))).as("m"))
      .select(col("a_id").as("vec_id"), col("m.b_id").as("ann_id"))
  }

  /** Embedding-cosine NEAR-DUP PAIRS (the embedding member of the
    * dedup family): LSH bucket candidates (same 4×16-bit tables and
    * per-bucket caps as [[annTopK]]) verified by the exact quantized
    * cosine — pairs with cos² ≥ threshMilli/1000 and positive dot.
    * Never all-pairs; the bucket join is the only candidate source, so
    * recall follows the LSH table count exactly like the text
    * minhash-LSH dedup. Output: (d1, d2, cos2_milli), d1 < d2. */
  def embedDedupPairs(corpus: DataFrame, threshMilli: Int = 980,
      cap: Int = 1024, broadcastMaxRows: Long = 1000000L): DataFrame = {
    val nEst = 4L * corpus.count()
    val capped = cappedBands(corpus, cap)
    val thin = capped.select("t", "bucket", "vec_id")
    val pairs = thin.select(col("t"), col("bucket"), col("vec_id").as("d1"))
      .join(graft.util.Joins.boundedBroadcast(
        thin.select(col("t"), col("bucket"), col("vec_id").as("d2")),
        nEst, broadcastMaxRows), Seq("t", "bucket"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    val qtab = corpus.select(col("vec_id"), col("q"), col("qq"))
    pairs
      .join(graft.util.Joins.boundedBroadcast(
        qtab.select(col("vec_id").as("d1"), col("q").as("qa"),
          col("qq").as("qqa")), nEst / 4, broadcastMaxRows), "d1")
      .join(graft.util.Joins.boundedBroadcast(
        qtab.select(col("vec_id").as("d2"), col("q").as("qb"),
          col("qq").as("qqb")), nEst / 4, broadcastMaxRows), "d2")
      .withColumn("dot", EmbedFunctions.vec_dot(col("qa"), col("qb")))
      .withColumn("key", {
        val den = col("qqa").cast("double") * col("qqb").cast("double")
        val num = col("dot").cast("double") * col("dot").cast("double")
        when(col("dot") < 0, -(num / den)).otherwise(num / den)
      })
      .withColumn("cos2_milli", floor(col("key") * 1000).cast("long"))
      .filter(col("cos2_milli") >= threshMilli)
      .select("d1", "d2", "cos2_milli")
  }

  /** Trained PQ codebook: flat m×k×dsub, sub-centroids ordered by
    * ascending seed id per subspace (so the kernel's smallest-index tie
    * rule equals the oracle's (d2, pid) window). Seeds are the first k
    * `vec_id % 7 == 1` rows' subvectors; ONE Lloyd refinement over the
    * bounded modulus sample (max(1, n div (sampleTarget·k))) with
    * integer-exact means; an empty sub-cluster KEEPS its seed centroid
    * (no dropout — k stays fixed, unlike the coarse quantizer). */
  private def pqTrain(corpus: DataFrame, n: Long, m: Int, k: Int,
      dsub: Int, sampleTarget: Int): Array[Long] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val seedRows = corpus.filter(pmod(col("vec_id"), lit(7)) === 1)
      .orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("q")).as[(Long, Seq[Long])].collect()
    require(seedRows.nonEmpty, "PQ needs at least one seed row")
    val kEff = seedRows.length
    val cents = new Array[Long](m * kEff * dsub)
    for (s <- 0 until m; c <- 0 until kEff; j <- 0 until dsub)
      cents((s * kEff + c) * dsub + j) = seedRows(c)._2(s * dsub + j)
    val mod = math.max(1L, n / (sampleTarget.toLong * k))
    val sample = corpus.filter(pmod(col("vec_id"), lit(mod)) === 0)
    val means = sample
      .select(col("q"),
        EmbedFunctions.pq_encode(col("q"), cents, m, kEff, dsub).as("codes"))
      .select(col("q"), col("codes"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("s"), element_at(col("codes"), col("s") + 1).as("code"),
        slice(col("q"), col("s") * dsub + 1, lit(dsub)).as("sv"))
      .select(col("s"), col("code"), posexplode(col("sv")))
      .groupBy("s", "code", "pos")
      .agg(expr("sum(col) div count(1)").as("v"))
      .collect()
    val out = cents.clone()
    for (r <- means)
      out((r.getInt(0) * kEff + r.getLong(1).toInt) * dsub + r.getInt(2)) =
        r.getLong(3)
    out
  }

  /** IVF-PQ — the third ANN family and the billion-scale memory shape:
    * coarse IVF routing exactly as [[ivfTop1]], but the inverted lists
    * store PRODUCT-QUANTIZED codes PACKED as m BYTES (BINARY column —
    * m+8 bytes/row vs the 64-long vector; EmbedExpressionsSpec pins
    * the size) and candidates are scored by ASYMMETRIC DISTANCE: each
    * probe row ships one m×k distance table (pq_dtable kernel) and a
    * candidate costs m array lookups (pq_adc) — no vector ever crosses
    * the inverted-list join. All integer-exact, so the full pipeline —
    * both trainers, codes, ADC scores, the final argmin — reproduces
    * bit-for-bit in the DuckDB oracle. Output: (vec_id, ann_id). */
  def ivfPqTop1(corpus: DataFrame, kSeeds: Int = 256, nProbe: Int = 2,
      lloydIters: Int = 2, sampleTarget: Int = 100, m: Int = 8, k: Int = 16,
      broadcastMaxRows: Long = 1000000L): DataFrame =
    ivfPqScored(corpus, kSeeds, nProbe, lloydIters, sampleTarget, m, k,
      broadcastMaxRows)
      .groupBy(col("a_id"))
      .agg(min(struct(col("ad2"), col("b_id"))).as("mn"))
      .select(col("a_id").as("vec_id"), col("mn.b_id").as("ann_id"))

  /** IVF-PQ + EXACT RE-RANK — the production ANN serving shape: ADC
    * ranks the whole inverted list cheaply, a per-query window keeps
    * the `shortlist` best candidates, and only those R rows gather
    * their exact vectors (two id equi-joins against the corpus) for an
    * exact integer-L2 re-score; output = exact-L2 argmin over the
    * shortlist. At 10^9 vectors the full vector column is touched R
    * times per query instead of |list| times, and the ADC
    * approximation error cannot pick the final answer — only narrow
    * the field. Integer-exact end to end, reproduced in SQL
    * (`q_embed_ann_ivfpq_rerank`). */
  def ivfPqRerankTop1(corpus: DataFrame, kSeeds: Int = 256, nProbe: Int = 2,
      lloydIters: Int = 2, sampleTarget: Int = 100, m: Int = 8, k: Int = 16,
      shortlist: Int = 8, broadcastMaxRows: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = ivfPqScored(corpus, kSeeds, nProbe, lloydIters, sampleTarget,
      m, k, broadcastMaxRows)
    val short = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("a_id").orderBy(col("ad2"), col("b_id"))))
      .filter(col("rk") <= shortlist)
      .select("a_id", "b_id")
    val vecs = corpus.select(col("vec_id"), col("q"))
    short
      .join(vecs.select(col("vec_id").as("a_id"), col("q").as("qa")), Seq("a_id"))
      .join(vecs.select(col("vec_id").as("b_id"), col("q").as("qb")), Seq("b_id"))
      .withColumn("d2", EmbedFunctions.vec_l2q(col("qa"), col("qb")))
      .groupBy(col("a_id"))
      .agg(min(struct(col("d2"), col("b_id"))).as("mn"))
      .select(col("a_id").as("vec_id"), col("mn.b_id").as("ann_id"))
  }

  /** Shared IVF-PQ candidate scoring: (a_id, b_id, ad2) for every
    * probed inverted-list candidate pair. */
  private def ivfPqScored(corpus: DataFrame, kSeeds: Int, nProbe: Int,
      lloydIters: Int, sampleTarget: Int, m: Int, k: Int,
      broadcastMaxRows: Long): DataFrame = {
    val n = corpus.count()
    val coarse = coarseCentroids(corpus, n, kSeeds, lloydIters, sampleTarget)
    val dim = coarse.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val pq = pqTrain(corpus, n, m, k, dsub, sampleTarget)
    val kEff = pq.length / (m * dsub)
    def topSids(nP: Int): Column = EmbedFunctions.ivf_top(col("q"),
      coarse.flatMap(_._2).toArray, coarse.map(_._1).toArray, nP)
    val withTop = corpus.select(col("vec_id"), col("q"),
        posexplode(topSids(nProbe)))
      .select(col("vec_id"), col("q"),
        (col("pos") + 1).as("rn"), col("col").as("sid"))
    // inverted list carries PACKED codes: m BYTES per row (BINARY), not
    // m longs — at 10^9 vectors this is what lets the lists fit
    // executor memory; only the bounded trainer sample ever sees the
    // ARRAY form (pqTrain needs the per-subspace explode)
    val assign = withTop.filter(col("rn") === 1)
      .select(col("sid"), col("vec_id").as("b_id"),
        EmbedFunctions.pq_encode_packed(col("q"), pq, m, kEff, dsub).as("codes"))
    val probe = withTop
      .select(col("sid"), col("vec_id").as("a_id"),
        EmbedFunctions.pq_dtable(col("q"), pq, m, kEff, dsub).as("dt"))
    val scored = probe
      .join(graft.util.Joins.boundedBroadcast(assign, n, broadcastMaxRows),
        Seq("sid"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("ad2", EmbedFunctions.pq_adc_packed(col("dt"), col("codes"), kEff))
    scored.select("a_id", "b_id", "ad2")
  }

  /** Exact-L2 brute-force top-1 (the comparator for the IVF-PQ recall
    * gate — ADC approximates squared L2, not the cosine key). Same
    * bounded-broadcast contract as [[bruteTopK]]. */
  def bruteL2Top1(s: SparkSession, corpus: DataFrame): DataFrame = {
    import s.implicits._
    val emb = corpus.select(col("vec_id"), col("q")).as[(Long, Seq[Long])]
    val all = s.sparkContext.broadcast(
      emb.collect().map { case (id, q) => (id, q.toArray) }.sortBy(_._1))
    emb.mapPartitions { it =>
      val cand = all.value
      it.map { case (id, qSeq) =>
        val qa = qSeq.toArray
        var bestId = Long.MaxValue
        var bestD = Long.MaxValue
        var ci = 0
        while (ci < cand.length) {
          val (oid, qb) = cand(ci)
          if (oid != id) {
            var d2 = 0L
            var j = 0
            while (j < qa.length) { val d = qa(j) - qb(j); d2 += d * d; j += 1 }
            if (d2 < bestD || (d2 == bestD && oid < bestId)) {
              bestD = d2; bestId = oid
            }
          }
          ci += 1
        }
        (id, bestId)
      }
    }.toDF("vec_id", "nn_id")
  }

  /** CORRECTNESS BASELINE — deliberately quadratic, NOT the scale path.
    * The whole corpus is collected to the driver, broadcast, and scanned
    * per row in a dense kernel (the same memory contract as a broadcast
    * join: one side fits per executor). Use only on bounded fixtures;
    * production similarity goes through [[annTopK]]. Output:
    * (vec_id, rk, nn_id). */
  def bruteTopK(s: SparkSession, corpus: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val emb = corpus.select(col("vec_id"), col("q"), col("qq"))
      .as[(Long, Seq[Long], Long)]
    val all = s.sparkContext.broadcast(
      emb.collect().map { case (id, q, qq) => (id, q.toArray, qq) }.sortBy(_._1))
    emb.mapPartitions { it =>
      val cand = all.value
      it.flatMap { case (id, qSeq, qq) =>
        val qa = qSeq.toArray
        val bestId = new Array[Long](k)
        val bestKey = Array.fill(k)(Double.NegativeInfinity)
        var ci = 0
        while (ci < cand.length) {
          val (oid, qb, oqq) = cand(ci)
          if (oid != id) {
            var dot = 0L
            var m = 0
            while (m < qa.length) { dot += qa(m) * qb(m); m += 1 }
            val dd = dot.toDouble
            val r = (dd * dd) / (qq.toDouble * oqq.toDouble)
            val key = if (dot < 0) -r else r
            var slot = -1
            var j = k - 1
            while (j >= 0 && (key > bestKey(j) ||
                (key == bestKey(j) && oid < bestId(j)))) { slot = j; j -= 1 }
            if (slot >= 0) {
              var n = k - 1
              while (n > slot) {
                bestKey(n) = bestKey(n - 1); bestId(n) = bestId(n - 1); n -= 1
              }
              bestKey(slot) = key; bestId(slot) = oid
            }
          }
          ci += 1
        }
        (0 until k).filter(bestKey(_) > Double.NegativeInfinity)
          .map(r2 => (id, r2 + 1, bestId(r2)))
      }
    }.toDF("vec_id", "rk", "nn_id")
  }

  private def baseQ(s: SparkSession, d: String, sliced: Boolean): DataFrame = {
    val t = Tables.t(s, d, "embeddings")
    val f = if (sliced) t.filter(pmod(col("vec_id"), lit(4)) === 0) else t
    f.select(col("vec_id"), quantize(col("embedding")).as("q"))
  }

  /** The twin-planted quantized corpus FIXTURE, staged once per
    * (session, sfDir, slice) — the shared input table of the whole
    * ANN/dedup gate family, exactly like the geo gates share one
    * prepared cover and the OSM gates one decoded fixture. Each gate
    * previously re-derived and re-checkpointed its own copy of the
    * identical rows (one materialization job per gate); the operators
    * under test (trainers, index builds, probes) still run per gate. */
  private lazy val corpusCached = new graft.util.SessionCache[
    scala.collection.concurrent.TrieMap[(String, Boolean), DataFrame]]

  private def stagedCorpus(s: SparkSession, d: String,
      sliced: Boolean): DataFrame =
    corpusCached.get(s)(scala.collection.concurrent.TrieMap.empty)
      .getOrElseUpdate((d, sliced), {
        val base = baseQ(s, d, sliced)
        corpusQ(base.union(twins(base))).localCheckpoint()
      })

  /** DuckDB CTE chain for the twin-planted quantized corpus `cc`;
    * `slice` injects the fixture-slice predicate. Shared by the LSH
    * and IVF oracles. */
  private def corpusSqlCtes(slice: String): String =
    s"""base AS (SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(x*1000) AS BIGINT)) AS q
       |  FROM embeddings$slice),
       |tw AS (SELECT vec_id + 1000000 AS tvid,
       |    list_transform(range(1, len(q)+1),
       |      i -> q[i] + (vec_id*31 + (i-1)) % 7 - 3) AS q
       |  FROM base),
       |c0 AS (SELECT * FROM base
       |  UNION ALL SELECT tvid AS vec_id, q FROM tw),
       |c AS (SELECT vec_id, q,
       |    list_transform(q, x -> CAST(x AS DOUBLE)) AS qd,
       |    list_sum(list_transform(q, x -> CAST(x*x AS DOUBLE))) AS qq
       |  FROM c0),
       |cc AS (SELECT * FROM c WHERE qq > 0)""".stripMargin

  /** DuckDB CTE chain for the LSH candidate generation + exact scoring
    * — ending in `sc(a_id, b_id, dot, den)` (both pair directions). */
  private def lshScoredSqlCtes(slice: String): String =
    s"""${corpusSqlCtes(slice)},
       |hp AS (SELECT t, k,
       |    list_transform(range(0, 64), i ->
       |      CAST((2654435761 * ((t*16+k)*64 + i + 1)) % 1000003 - 501001 AS DOUBLE)) AS w
       |  FROM (SELECT unnest(range(0, 4)) AS t), (SELECT unnest(range(0, 16)) AS k)),
       |bk AS (SELECT cc.vec_id, hp.t,
       |    CAST(sum(CASE WHEN list_inner_product(cc.qd, hp.w) > 0
       |      THEN 1 << CAST(hp.k AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM cc, hp GROUP BY cc.vec_id, hp.t),
       |cap AS (SELECT vec_id, t, bucket FROM (
       |    SELECT vec_id, t, bucket, row_number() OVER (
       |      PARTITION BY t, bucket
       |      ORDER BY (vec_id*2654435761) % 1000000007, vec_id) AS rn FROM bk)
       |  WHERE rn <= 1024),
       |pr AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
       |  FROM cap a JOIN cap b ON a.t = b.t AND a.bucket = b.bucket
       |    AND a.vec_id <> b.vec_id),
       |sc AS (SELECT pr.a_id, pr.b_id,
       |    list_inner_product(ca.qd, cb.qd) AS dot, ca.qq*cb.qq AS den
       |  FROM pr JOIN cc ca ON ca.vec_id = pr.a_id
       |    JOIN cc cb ON cb.vec_id = pr.b_id)""".stripMargin

  /** Shared DuckDB CTE chain for the LSH ANN over that corpus. */
  private def annSqlCtes(slice: String): String =
    s"""${lshScoredSqlCtes(slice)},
       |ann AS (SELECT a_id, b_id FROM (
       |  SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id ORDER BY
       |    (CASE WHEN dot < 0 THEN -1 ELSE 1 END) * (dot*dot) / den DESC,
       |    b_id) AS rk FROM sc)
       |WHERE rk = 1)""".stripMargin

  /** Shared DuckDB CTE chain for the trained COARSE quantizer over the
    * twin-planted corpus: bounded training sample (25600 =
    * sampleTarget·kSeeds, mirroring coarseCentroids' modulus rule),
    * seeds, two Lloyd iterations over the SAMPLE, full-corpus ranking —
    * ending in `ranked(vec_id, sid, rn)`. */
  private def coarseSqlCtes(slice: String): String =
    s"""${corpusSqlCtes(slice)},
       |mm AS (SELECT GREATEST(1, count(*) // 25600) AS m FROM cc),
       |smp AS (SELECT * FROM cc WHERE vec_id % (SELECT m FROM mm) = 0),
       |seeds AS (SELECT vec_id AS sid, q AS sq FROM cc
       |  WHERE vec_id % 7 = 1 ORDER BY vec_id LIMIT 256),
       |dims AS (SELECT unnest(range(1, 65)) AS i),
       |a1 AS (SELECT vec_id, sid FROM (
       |  SELECT smp.vec_id, s.sid, row_number() OVER (
       |    PARTITION BY smp.vec_id ORDER BY
       |      list_sum(list_transform(range(1, len(smp.q)+1),
       |        i -> CAST((smp.q[i]-s.sq[i])*(smp.q[i]-s.sq[i]) AS BIGINT))),
       |      s.sid) AS rn
       |  FROM smp, seeds s) WHERE rn = 1),
       |m1 AS (SELECT a.sid, d.i,
       |    CAST(sum(smp.q[d.i]) AS BIGINT) // count(*) AS v
       |  FROM a1 a JOIN smp ON smp.vec_id = a.vec_id CROSS JOIN dims d
       |  GROUP BY a.sid, d.i),
       |c1 AS (SELECT sid, list(v ORDER BY i) AS sq FROM m1 GROUP BY sid),
       |a2 AS (SELECT vec_id, sid FROM (
       |  SELECT smp.vec_id, s.sid, row_number() OVER (
       |    PARTITION BY smp.vec_id ORDER BY
       |      list_sum(list_transform(range(1, len(smp.q)+1),
       |        i -> CAST((smp.q[i]-s.sq[i])*(smp.q[i]-s.sq[i]) AS BIGINT))),
       |      s.sid) AS rn
       |  FROM smp, c1 s) WHERE rn = 1),
       |m2 AS (SELECT a.sid, d.i,
       |    CAST(sum(smp.q[d.i]) AS BIGINT) // count(*) AS v
       |  FROM a2 a JOIN smp ON smp.vec_id = a.vec_id CROSS JOIN dims d
       |  GROUP BY a.sid, d.i),
       |c2 AS (SELECT sid, list(v ORDER BY i) AS sq FROM m2 GROUP BY sid),
       |ranked AS (SELECT cc.vec_id, s.sid,
       |    row_number() OVER (PARTITION BY cc.vec_id ORDER BY
       |      list_sum(list_transform(range(1, len(cc.q)+1),
       |        i -> CAST((cc.q[i]-s.sq[i])*(cc.q[i]-s.sq[i]) AS BIGINT))),
       |      s.sid) AS rn
       |  FROM cc, c2 s)""".stripMargin

  /** Coarse chain + the exact-cosine probe×assign scoring tail —
    * ending in `ann(a_id, b_id)` (the IVF family oracle). */
  private def ivfSqlCtes(slice: String): String =
    s"""${coarseSqlCtes(slice)},
       |assign AS (SELECT r.vec_id AS b_id, r.sid, cb.qd AS qbd, cb.qq AS qqb
       |  FROM ranked r JOIN cc cb ON cb.vec_id = r.vec_id WHERE r.rn = 1),
       |probe AS (SELECT r.vec_id AS a_id, r.sid, ca.qd AS qad, ca.qq AS qqa
       |  FROM ranked r JOIN cc ca ON ca.vec_id = r.vec_id WHERE r.rn <= 2),
       |sc AS (SELECT p.a_id, a.b_id,
       |    list_inner_product(p.qad, a.qbd) AS dot, p.qqa*a.qqb AS den
       |  FROM probe p JOIN assign a ON a.sid = p.sid AND a.b_id <> p.a_id),
       |ann AS (SELECT a_id, b_id FROM (
       |  SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id ORDER BY
       |    (CASE WHEN dot < 0 THEN -1 ELSE 1 END) * (dot*dot) / den DESC,
       |    b_id) AS rk FROM sc) WHERE rk = 1)""".stripMargin

  /** Coarse chain + the FULL IVF-PQ pipeline: PQ seeds (first 16
    * vec_id%7==1 rows' subvectors, 8 subspaces × 8 dims), one Lloyd
    * refinement over the PQ sample (1600 = sampleTarget·k; empty
    * sub-clusters keep their seed), full-corpus codes, candidates from
    * the coarse lists, ADC scoring — ending in `ann(a_id, b_id)`. */
  private def ivfPqSqlCtes(slice: String): String =
    s"""${coarseSqlCtes(slice)},
       |pmm AS (SELECT GREATEST(1, count(*) // 1600) AS mq FROM cc),
       |psmp AS (SELECT * FROM cc WHERE vec_id % (SELECT mq FROM pmm) = 0),
       |pseed AS (SELECT q, row_number() OVER (ORDER BY vec_id) - 1 AS cidx
       |  FROM (SELECT vec_id, q FROM cc WHERE vec_id % 7 = 1
       |        ORDER BY vec_id LIMIT 16)),
       |ss AS (SELECT unnest(range(0, 8)) AS s),
       |di AS (SELECT unnest(range(1, 9)) AS i),
       |pc0 AS (SELECT s, cidx,
       |    list_transform(range(1, 9), i -> q[s*8 + i]) AS sv
       |  FROM pseed, ss),
       |pa AS (SELECT vec_id, s, cidx FROM (
       |  SELECT p.vec_id, c.s, c.cidx, row_number() OVER (
       |    PARTITION BY p.vec_id, c.s ORDER BY
       |      list_sum(list_transform(range(1, 9),
       |        i -> CAST((p.q[c.s*8+i] - c.sv[i])*(p.q[c.s*8+i] - c.sv[i]) AS BIGINT))),
       |      c.cidx) AS rn
       |  FROM psmp p, pc0 c) WHERE rn = 1),
       |pmv AS (SELECT a.s, a.cidx, d.i,
       |    CAST(sum(p.q[a.s*8 + d.i]) AS BIGINT) // count(*) AS v
       |  FROM pa a JOIN psmp p ON p.vec_id = a.vec_id CROSS JOIN di d
       |  GROUP BY a.s, a.cidx, d.i),
       |pc1 AS (SELECT c.s, c.cidx,
       |    list(coalesce(m.v, c.sv[d.i]) ORDER BY d.i) AS sv
       |  FROM pc0 c CROSS JOIN di d
       |    LEFT JOIN pmv m ON m.s = c.s AND m.cidx = c.cidx AND m.i = d.i
       |  GROUP BY c.s, c.cidx),
       |pcodes AS (SELECT vec_id, s, cidx FROM (
       |  SELECT v.vec_id, c.s, c.cidx, row_number() OVER (
       |    PARTITION BY v.vec_id, c.s ORDER BY
       |      list_sum(list_transform(range(1, 9),
       |        i -> CAST((v.q[c.s*8+i] - c.sv[i])*(v.q[c.s*8+i] - c.sv[i]) AS BIGINT))),
       |      c.cidx) AS rn
       |  FROM cc v, pc1 c) WHERE rn = 1),
       |cand AS (SELECT DISTINCT p.vec_id AS a_id, a.vec_id AS b_id
       |  FROM ranked p JOIN ranked a ON a.sid = p.sid AND a.rn = 1
       |    AND a.vec_id <> p.vec_id
       |  WHERE p.rn <= 2),
       |adc AS (SELECT c.a_id, c.b_id,
       |    CAST(sum(list_sum(list_transform(range(1, 9),
       |      i -> CAST((qa.q[cb.s*8+i] - pc.sv[i])*(qa.q[cb.s*8+i] - pc.sv[i]) AS BIGINT)))) AS BIGINT) AS ad2
       |  FROM cand c
       |    JOIN pcodes cb ON cb.vec_id = c.b_id
       |    JOIN pc1 pc ON pc.s = cb.s AND pc.cidx = cb.cidx
       |    JOIN cc qa ON qa.vec_id = c.a_id
       |  GROUP BY c.a_id, c.b_id),
       |ann AS (SELECT a_id, b_id FROM (
       |  SELECT a_id, b_id, row_number() OVER (
       |    PARTITION BY a_id ORDER BY ad2, b_id) AS rk
       |  FROM adc) WHERE rk = 1)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // brute-force quantized-cosine top-3 — oracle BASELINE on the
    // deterministic fixture slice (the scale path is q_embed_ann_lsh)
    QueryDef(
      "q_embed_cosine_topk",
      (s, d) =>
        bruteTopK(s, corpusQ(baseQ(s, d, sliced = true)), 3)
          .orderBy("vec_id", "rk"),
      Some("""WITH q AS (SELECT vec_id,
             |    list_transform(embedding, x -> round(x*1000)) AS q,
             |    list_sum(list_transform(embedding,
             |      x -> round(x*1000) * round(x*1000))) AS qq
             |  FROM embeddings WHERE vec_id % 4 = 0)
             |SELECT vec_id, rk, nn_id FROM (
             |  SELECT a.vec_id, b.vec_id AS nn_id,
             |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
             |      (CASE WHEN list_inner_product(a.q, b.q) < 0 THEN -1 ELSE 1 END) *
             |      (list_inner_product(a.q, b.q) * list_inner_product(a.q, b.q))
             |        / (a.qq * b.qq) DESC,
             |      b.vec_id) AS rk
             |  FROM q a, q b
             |  WHERE a.vec_id <> b.vec_id AND a.qq > 0 AND b.qq > 0)
             |WHERE rk <= 3 ORDER BY vec_id, rk""".stripMargin)),

    // THE DEFAULT PATH: LSH-bucketed ANN over the twin-planted corpus
    QueryDef(
      "q_embed_ann_lsh",
      (s, d) => {
        // checkpoint: annTopK's broadcast-bound count plus the two
        // bucket-join sides would otherwise each recompute the
        // quantization scan
        val corpus = stagedCorpus(s, d, sliced = false)
        annTopK(corpus, k = 1)
          .select(col("vec_id"), col("ann_id"))
          .orderBy("vec_id")
      },
      Some(s"""WITH ${annSqlCtes("")}
             |SELECT a_id AS vec_id, b_id AS ann_id FROM ann
             |ORDER BY vec_id""".stripMargin)),

    // second ANN family: IVF with a data-dependent (deterministic)
    // coarse quantizer — full DuckDB oracle reproduces index + probe
    QueryDef(
      "q_embed_ann_ivf",
      (s, d) => {
        val corpus = stagedCorpus(s, d, sliced = false)
        ivfTop1(corpus).orderBy("vec_id")
      },
      Some(s"""WITH ${ivfSqlCtes("")}
             |SELECT a_id AS vec_id, b_id AS ann_id FROM ann
             |ORDER BY vec_id""".stripMargin)),

    // the embedding member of the DEDUP family: thresholded near-dup
    // pairs (LSH candidates + exact quantized-cosine verify) — every
    // planted twin pair must surface with cos2_milli ≈ 999
    QueryDef(
      "q_embed_dedup",
      (s, d) => {
        val corpus = stagedCorpus(s, d, sliced = false)
        embedDedupPairs(corpus).orderBy("d1", "d2")
      },
      Some(s"""WITH ${lshScoredSqlCtes("")}
             |SELECT a_id AS d1, b_id AS d2,
             |  CAST(floor(1000 * (CASE WHEN dot < 0 THEN -1 ELSE 1 END)
             |    * (dot*dot) / den) AS BIGINT) AS cos2_milli
             |FROM sc
             |WHERE a_id < b_id
             |  AND CAST(floor(1000 * (CASE WHEN dot < 0 THEN -1 ELSE 1 END)
             |    * (dot*dot) / den) AS BIGINT) >= 980
             |ORDER BY d1, d2""".stripMargin)),

    // third ANN family: IVF-PQ — coarse routing + product-quantized
    // inverted lists + asymmetric-distance scoring, the billion-scale
    // memory shape; the full pipeline (both trainers, codes, ADC,
    // argmin) reproduces bit-for-bit in SQL
    QueryDef(
      "q_embed_ann_ivfpq",
      (s, d) => {
        val corpus = stagedCorpus(s, d, sliced = false)
        ivfPqTop1(corpus).orderBy("vec_id")
      },
      Some(s"""WITH ${ivfPqSqlCtes("")}
             |SELECT a_id AS vec_id, b_id AS ann_id FROM ann
             |ORDER BY vec_id""".stripMargin)),

    // IVF-PQ + exact re-rank (the production serving shape): ADC keeps
    // the 8 best candidates per query, only those gather their exact
    // vectors for an exact-L2 re-score. Same CTEs as the plain IVF-PQ
    // gate, plus shortlist window + gather + re-rank reproduced in SQL
    // — candidate set, shortlist, exact distances and the final argmin
    // are all value-checked.
    QueryDef(
      "q_embed_ann_ivfpq_rerank",
      (s, d) => {
        val corpus = stagedCorpus(s, d, sliced = false)
        ivfPqRerankTop1(corpus).orderBy("vec_id")
      },
      Some(s"""WITH ${ivfPqSqlCtes("")},
             |short AS (SELECT a_id, b_id FROM (
             |  SELECT a_id, b_id, row_number() OVER (
             |    PARTITION BY a_id ORDER BY ad2, b_id) AS rk
             |  FROM adc) WHERE rk <= 8),
             |rr AS (SELECT s.a_id, s.b_id,
             |    list_sum(list_transform(range(1, len(qa.q)+1),
             |      i -> CAST((qa.q[i]-qb.q[i])*(qa.q[i]-qb.q[i]) AS BIGINT))) AS d2
             |  FROM short s
             |    JOIN cc qa ON qa.vec_id = s.a_id
             |    JOIN cc qb ON qb.vec_id = s.b_id)
             |SELECT a_id AS vec_id, b_id AS ann_id FROM (
             |  SELECT a_id, b_id, row_number() OVER (
             |    PARTITION BY a_id ORDER BY d2, b_id) AS rk
             |  FROM rr) WHERE rk = 1
             |ORDER BY vec_id""".stripMargin)),

    // recall@1 of the IVF-PQ path vs exact-L2 brute force on the
    // sliced corpus (ADC approximates squared L2, so L2 — not the
    // cosine key — is its ground truth); floor in SimilaritySpec
    QueryDef(
      "q_embed_ann_ivfpq_recall",
      (s, d) => {
        val corpus = stagedCorpus(s, d, sliced = true)
        val ann = ivfPqTop1(corpus).select(col("vec_id"), col("ann_id"))
        val exact = bruteL2Top1(s, corpus)
        exact.join(ann, Seq("vec_id"), "left_outer")
          .agg(count(lit(1)).as("n_eval"),
            sum(when(col("ann_id") === col("nn_id"), 1L).otherwise(0L)).as("n_hit"))
          .select(col("n_eval"), col("n_hit"),
            expr("n_hit * 1000 DIV n_eval").as("recall_milli"))
      },
      Some(s"""WITH ${ivfPqSqlCtes(" WHERE vec_id % 4 = 0")},
             |bf AS (SELECT vec_id, nn_id FROM (
             |  SELECT a.vec_id, b.vec_id AS nn_id,
             |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
             |      list_sum(list_transform(range(1, len(a.q)+1),
             |        i -> CAST((a.q[i]-b.q[i])*(a.q[i]-b.q[i]) AS BIGINT))),
             |      b.vec_id) AS rk
             |  FROM cc a, cc b WHERE a.vec_id <> b.vec_id)
             |  WHERE rk = 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_eval,
             |  CAST(sum(CASE WHEN ann.b_id = bf.nn_id THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             |  CAST(sum(CASE WHEN ann.b_id = bf.nn_id THEN 1 ELSE 0 END) * 1000
             |    // count(*) AS BIGINT) AS recall_milli
             |FROM bf LEFT JOIN ann ON ann.a_id = bf.vec_id""".stripMargin)),

    // recall@1 of the IVF path vs the sliced brute force on the SAME
    // twin-planted corpus — the IVF twin of q_embed_ann_recall. The
    // ≥0.95 floor is asserted in SimilaritySpec; the gate pins the
    // measured value exactly.
    QueryDef(
      "q_embed_ann_ivf_recall",
      (s, d) => {
        val corpus = stagedCorpus(s, d, sliced = true)
        val ann = ivfTop1(corpus).select(col("vec_id"), col("ann_id"))
        val exact = bruteTopK(s, corpus, 1).select(col("vec_id"), col("nn_id"))
        exact.join(ann, Seq("vec_id"), "left_outer")
          .agg(count(lit(1)).as("n_eval"),
            sum(when(col("ann_id") === col("nn_id"), 1L).otherwise(0L)).as("n_hit"))
          .select(col("n_eval"), col("n_hit"),
            expr("n_hit * 1000 DIV n_eval").as("recall_milli"))
      },
      Some(s"""WITH ${ivfSqlCtes(" WHERE vec_id % 4 = 0")},
             |bf AS (SELECT vec_id, nn_id FROM (
             |  SELECT a.vec_id, b.vec_id AS nn_id,
             |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
             |      (CASE WHEN list_inner_product(a.qd, b.qd) < 0 THEN -1 ELSE 1 END) *
             |      (list_inner_product(a.qd, b.qd) * list_inner_product(a.qd, b.qd))
             |        / (a.qq * b.qq) DESC,
             |      b.vec_id) AS rk
             |  FROM cc a, cc b WHERE a.vec_id <> b.vec_id)
             |  WHERE rk = 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_eval,
             |  CAST(sum(CASE WHEN ann.b_id = bf.nn_id THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             |  CAST(sum(CASE WHEN ann.b_id = bf.nn_id THEN 1 ELSE 0 END) * 1000
             |    // count(*) AS BIGINT) AS recall_milli
             |FROM bf LEFT JOIN ann ON ann.a_id = bf.vec_id""".stripMargin)),

    // recall@1 gate: ANN vs the sliced brute force on the SAME
    // twin-planted corpus — one integer row, exact on both engines.
    // The ≥0.95 floor itself is asserted in SimilaritySpec (the gate
    // pins the measured value; the spec pins the property).
    QueryDef(
      "q_embed_ann_recall",
      (s, d) => {
        val corpus = stagedCorpus(s, d, sliced = true)
        val ann = annTopK(corpus, k = 1)
          .select(col("vec_id"), col("ann_id"))
        val exact = bruteTopK(s, corpus, 1).select(col("vec_id"), col("nn_id"))
        exact.join(ann, Seq("vec_id"), "left_outer")
          .agg(count(lit(1)).as("n_eval"),
            sum(when(col("ann_id") === col("nn_id"), 1L).otherwise(0L)).as("n_hit"))
          .select(col("n_eval"), col("n_hit"),
            expr("n_hit * 1000 DIV n_eval").as("recall_milli"))
      },
      Some(s"""WITH ${annSqlCtes(" WHERE vec_id % 4 = 0")},
             |bf AS (SELECT vec_id, nn_id FROM (
             |  SELECT a.vec_id, b.vec_id AS nn_id,
             |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
             |      (CASE WHEN list_inner_product(a.qd, b.qd) < 0 THEN -1 ELSE 1 END) *
             |      (list_inner_product(a.qd, b.qd) * list_inner_product(a.qd, b.qd))
             |        / (a.qq * b.qq) DESC,
             |      b.vec_id) AS rk
             |  FROM cc a, cc b WHERE a.vec_id <> b.vec_id)
             |  WHERE rk = 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_eval,
             |  CAST(sum(CASE WHEN ann.b_id = bf.nn_id THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             |  CAST(sum(CASE WHEN ann.b_id = bf.nn_id THEN 1 ELSE 0 END) * 1000
             |    // count(*) AS BIGINT) AS recall_milli
             |FROM bf LEFT JOIN ann ON ann.a_id = bf.vec_id""".stripMargin))
  )
}
