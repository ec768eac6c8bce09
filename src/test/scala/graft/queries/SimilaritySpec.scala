package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plain-Scala oracles + recall floors for the similarity operators
  * (both are ALSO fully DuckDB-oracled in the driver gate; these specs
  * pin the semantics independently and assert recall properties the
  * row-compare can't express). */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Quantized vectors — the operator's defined domain (round(x*1000)). */
  private lazy val qvecs: Map[Long, Array[Long]] = {
    import org.apache.spark.sql.functions._
    graft.util.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(x => math.round(x.toDouble * 1000)).toArray).toMap
  }

  /** The exact ranking key: sign(dot)·dot²/(|a|²·|b|²). */
  private def key(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0L; var qa = 0L; var qb = 0L
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); qa += a(i) * a(i); qb += b(i) * b(i); i += 1 }
    val r = (dot.toDouble * dot.toDouble) / (qa.toDouble * qb.toDouble)
    if (dot < 0) -r else r
  }

  /** The ANN corpus: base vectors plus integer-jittered twins. */
  private lazy val corpus: Map[Long, Array[Long]] =
    qvecs ++ qvecs.map { case (id, q) =>
      (id + 1000000L) -> q.zipWithIndex.map { case (x, i) =>
        x + Math.floorMod(id * 31 + i, 7) - 3 }
    }

  /** The brute-force baseline's bounded domain: the fixture slice. */
  private lazy val sliced: Map[Long, Array[Long]] =
    qvecs.filter { case (id, _) => id % 4 == 0 }

  test("brute-force cosine top-3 matches the Scala quantized-key oracle") {
    val got = SparkEntry.queries("q_embed_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.keySet.map(_._1) == sliced.keySet,
      "baseline must cover exactly the fixture slice")
    for ((id, v) <- sliced) {
      val expect = sliced.toSeq.filter(_._1 != id)
        .map { case (oid, ov) => (-key(v, ov), oid) }.sorted.take(3).map(_._2)
      for ((want, rk) <- expect.zipWithIndex)
        assert(got((id, rk + 1)) == want, s"vec $id rank ${rk + 1}")
    }
  }

  test("q_embed_ann_recall reports recall@1 above the 0.95 floor") {
    val row = SparkEntry.queries("q_embed_ann_recall")(spark, sf).collect().head
    val (nEval, nHit, milli) = (row.getLong(0), row.getLong(1), row.getLong(2))
    info(s"ann recall gate: $nHit/$nEval = ${milli / 1000.0}")
    assert(nEval > 0 && milli >= 950,
      s"ANN recall@1 $milli‰ below the 950‰ floor ($nHit/$nEval)")
  }

  test("over-bound ANN broadcasts degrade to shuffled-hash with identical output") {
    import org.apache.spark.sql.functions._
    // broadcastMaxRows = 0 forces the degrade branch on BOTH families;
    // rows must be identical and the scoring join must NOT broadcast
    // (the build sides are full-corpus tables behind Generates whose
    // stats Spark underestimates — the kNN r4 lesson, applied here)
    val base = graft.util.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 1000, 0).cast("long")).as("q"))
    val cc = Similarity.corpusQ(base.union(Similarity.twins(base))).localCheckpoint()
    def noBhjOnCorpus(df: org.apache.spark.sql.DataFrame): Boolean = {
      val plan = df.queryExecution.executedPlan.toString
      !plan.contains("BroadcastHashJoin")
    }
    val lshDefault = Similarity.annTopK(cc, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val lshDegraded = Similarity.annTopK(cc, k = 1, broadcastMaxRows = 0L)
    assert(lshDegraded.collect().map(r => (r.getLong(0), r.getLong(2)))
      .sortBy(_._1).toSeq == lshDefault)
    assert(noBhjOnCorpus(lshDegraded), "LSH degrade must not broadcast")
    val ivfDefault = Similarity.ivfTop1(cc).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val ivfDegraded = Similarity.ivfTop1(cc, broadcastMaxRows = 0L)
    assert(ivfDegraded.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq == ivfDefault)
    assert(noBhjOnCorpus(ivfDegraded), "IVF degrade must not broadcast")
  }

  test("q_embed_ann_ivf_recall reports recall@1 above the 0.90 floor") {
    val row = SparkEntry.queries("q_embed_ann_ivf_recall")(spark, sf).collect().head
    val (nEval, nHit, milli) = (row.getLong(0), row.getLong(1), row.getLong(2))
    info(s"ivf recall gate: $nHit/$nEval = ${milli / 1000.0}")
    // nProbe=2 over 256 trained lists: slightly looser than the 4-table
    // LSH floor — a true NN in a non-adjacent list is unreachable
    assert(nEval > 0 && milli >= 900,
      s"IVF recall@1 $milli‰ below the 900‰ floor ($nHit/$nEval)")
  }

  test("q_embed_ann_ivfpq_recall reports recall@1 above the 0.85 floor") {
    val row = SparkEntry.queries("q_embed_ann_ivfpq_recall")(spark, sf).collect().head
    val (nEval, nHit, milli) = (row.getLong(0), row.getLong(1), row.getLong(2))
    info(s"ivfpq recall gate: $nHit/$nEval = ${milli / 1000.0}")
    // ADC is an approximation of L2 on top of nProbe=2 routing — the
    // loosest floor of the three families (measured 1.000 at fixture
    // scale; the floor guards against quantizer degradation)
    assert(nEval > 0 && milli >= 850,
      s"IVF-PQ recall@1 $milli‰ below the 850‰ floor ($nHit/$nEval)")
  }

  test("IVF-PQ exact re-rank never loses to the plain ADC pick (exact L2)") {
    def l2(a: Array[Long], b: Array[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * BigInt(x - y) }.sum
    val plain = SparkEntry.queries("q_embed_ann_ivfpq")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rer = SparkEntry.queries("q_embed_ann_ivfpq_rerank")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rer.keySet == plain.keySet,
      "re-rank must answer exactly the queries the plain path answers")
    // re-ranking an ADC shortlist that contains the ADC argmin can only
    // improve (or tie) the EXACT distance of the returned neighbour
    var improved = 0
    for ((id, p) <- plain) {
      val dPlain = l2(corpus(id), corpus(p))
      val dRer = l2(corpus(id), corpus(rer(id)))
      assert(dRer <= dPlain, s"vec $id: re-rank $dRer worse than ADC $dPlain")
      if (dRer < dPlain) improved += 1
    }
    info(s"re-rank strictly improved ${improved}/${plain.size} answers")
    // and the twin is still found at least as often
    val baseIds = qvecs.keySet
    val twinRecall = baseIds.count(id => rer.get(id).contains(id + 1000000L))
      .toDouble / baseIds.size
    info(f"IVF-PQ+rerank twin recall@1 = $twinRecall%.3f")
    assert(twinRecall >= 0.90)
  }

  test("embedding near-dup pairs recover the planted twins; every pair verifies exactly") {
    val got = SparkEntry.queries("q_embed_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // twin pairs (id, id+1e6) are cos² ≈ 0.9999 — ≥95% must surface
    val baseIds = qvecs.keySet.filter(id => corpus(id).exists(_ != 0L))
    val twinHit = baseIds.count(id => got.contains((id, id + 1000000L)))
    info(f"twin-pair recall = ${twinHit.toDouble / baseIds.size}%.3f (${got.size} pairs)")
    assert(twinHit.toDouble / baseIds.size >= 0.95)
    // every emitted pair re-verifies against the Scala key at the
    // gate's threshold — no false positives from the bucket join
    for (((d1, d2), milli) <- got) {
      val k = key(corpus(d1), corpus(d2))
      assert(math.floor(k * 1000).toLong == milli, s"pair ($d1,$d2)")
      assert(milli >= 980)
    }
  }

  test("ANN-IVFPQ finds the planted twin for nearly every vector") {
    val got = SparkEntry.queries("q_embed_ann_ivfpq")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    val baseIds = qvecs.keySet
    val twinHits = baseIds.count(id => got.get(id).contains(id + 1000000L))
    val twinRecall = twinHits.toDouble / baseIds.size
    info(f"IVF-PQ twin recall@1 = $twinRecall%.3f (coverage ${got.size}/${corpus.size})")
    assert(twinRecall >= 0.90, f"IVF-PQ twin recall $twinRecall%.3f below floor")
  }

  test("ANN-LSH finds the planted twin for nearly every vector") {
    val got = SparkEntry.queries("q_embed_ann_lsh")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "buckets must produce candidates")
    // twin recall: base id i's nearest neighbour in the corpus is its
    // twin i+1e6 (θ ≈ 0.01 rad) — the LSH must find it for ≥ 95%
    val baseIds = qvecs.keySet
    val twinHits = baseIds.count(id => got.get(id).contains(id + 1000000L))
    val twinRecall = twinHits.toDouble / baseIds.size
    info(f"twin recall@1 = $twinRecall%.3f (coverage ${got.size}/${corpus.size})")
    assert(twinRecall >= 0.95, f"twin recall $twinRecall%.3f below floor")
    // and against the true brute-force top-1 over the whole corpus
    val trueNN = corpus.map { case (id, v) =>
      id -> corpus.toSeq.filter(_._1 != id).map { case (o, ov) => (-key(v, ov), o) }.min._2
    }
    val hits = got.count { case (id, ann) => trueNN(id) == ann }
    val recall = hits.toDouble / corpus.size
    info(f"overall recall@1 = $recall%.3f")
    assert(recall >= 0.90, f"overall recall $recall%.3f below floor")
  }

  test("ANN-IVF finds the planted twin and tracks the true top-1") {
    val got = SparkEntry.queries("q_embed_ann_ivf")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "probed inverted lists must produce candidates")
    val baseIds = qvecs.keySet
    val twinHits = baseIds.count(id => got.get(id).contains(id + 1000000L))
    val twinRecall = twinHits.toDouble / baseIds.size
    info(f"IVF twin recall@1 = $twinRecall%.3f (coverage ${got.size}/${corpus.size})")
    // twin pairs are nearly parallel, so they land in the same or an
    // adjacent inverted list; nProbe=2 must recover ≥ 90% of them
    assert(twinRecall >= 0.90, f"IVF twin recall $twinRecall%.3f below floor")
    val trueNN = corpus.map { case (id, v) =>
      id -> corpus.toSeq.filter(_._1 != id).map { case (o, ov) => (-key(v, ov), o) }.min._2
    }
    val hits = got.count { case (id, ann) => trueNN(id) == ann }
    val recall = hits.toDouble / corpus.size
    info(f"IVF overall recall@1 = $recall%.3f")
    assert(recall >= 0.85, f"IVF overall recall $recall%.3f below floor")
  }
}

private object SparkEntry {
  def queries = graft.SparkEntry.queries
}
