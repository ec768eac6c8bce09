package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The integer vector kernels under the embedding operators: values
  * against a plain-Scala oracle, codegen ≡ interpreted, loud failure
  * on dimension mismatch. */
class EmbedExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecs: Seq[(Array[Long], Array[Long])] = (0 until 50).map { i =>
    val a = Array.tabulate(64)(j => ((i * 131L + j * 31L) % 2001L) - 1000L)
    val b = Array.tabulate(64)(j => ((i * 257L + j * 17L) % 2001L) - 1000L)
    (a, b)
  }

  test("vec_dot / vec_l2q match the scalar oracle") {
    val df = vecs.toDF("a", "b")
      .select(EmbedFunctions.vec_dot($"a", $"b").as("dot"),
        EmbedFunctions.vec_l2q($"a", $"b").as("d2"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = vecs.map { case (a, b) =>
      (a.zip(b).map { case (x, y) => x * y }.sum,
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    assert(got.toSeq == want)
  }

  test("vector kernel codegen COMPILES and matches forced-interpreted eval") {
    // factoryMode, not the wholeStage flag: CODEGEN_ONLY + fallback=off
    // makes a broken doGenCode THROW instead of silently falling back
    // to interpreted eval (which would make this comparison vacuous);
    // NO_CODEGEN forces the nullSafeEval path
    def run(): Seq[(Long, Long)] = vecs.toDF("a", "b")
      .select(EmbedFunctions.vec_dot($"a", $"b"),
        EmbedFunctions.vec_l2q($"a", $"b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = run()
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val fused = run()
      assert(interp == fused)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }

  test("ivf_top ranks centroids by (L2, sid) and its codegen matches interpreted") {
    // 4 centroids; centroid 2 and 3 are duplicates → tie broken by sid
    val cents: Seq[Array[Long]] = Seq(
      Array.fill(64)(0L), Array.fill(64)(10L),
      Array.fill(64)(5L), Array.fill(64)(5L))
    val sids = Array(100L, 101L, 103L, 102L)
    val flat = cents.flatten.toArray
    def run(): Seq[Seq[Long]] = vecs.map(_._1).toDF("q")
      .select(EmbedFunctions.ivf_top($"q", flat, sids, 3))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    def oracle(q: Array[Long]): Seq[Long] =
      sids.zipWithIndex.map { case (sid, c) =>
        (q.zip(cents(c)).map { case (x, y) => (x - y) * (x - y) }.sum, sid)
      }.sortBy(identity).take(3).map(_._2).toSeq
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = run()
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val fused = run()
      assert(interp == fused)
      assert(interp == vecs.map(v => oracle(v._1)))
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
    // an equidistant pair must resolve to the smaller sid first: probe
    // exactly between centroids 102 and 103
    val mid = Seq(Array.fill(64)(5L)).toDF("q")
      .select(EmbedFunctions.ivf_top($"q", flat, sids, 2))
      .collect()(0).getSeq[Long](0)
    assert(mid == Seq(102L, 103L))
  }

  test("pq_encode / pq_dtable / pq_adc match the scalar oracle; codegen ≡ interpreted") {
    val m = 8; val k = 4; val dsub = 8
    // codebook: centroid c of subspace s = constant (s*10 + c*3 - 4)
    val cents = Array.tabulate(m * k * dsub) { f =>
      val s = f / (k * dsub); val c = (f / dsub) % k
      (s * 10 + c * 3 - 4).toLong
    }
    def oracleEncode(q: Array[Long]): Seq[Long] =
      (0 until m).map { s =>
        (0 until k).map { c =>
          ((0 until dsub).map { j =>
            val d = q(s * dsub + j) - cents((s * k + c) * dsub + j); d * d
          }.sum, c.toLong)
        }.min._2
      }
    def oracleAdc(q: Array[Long], codes: Seq[Long]): Long =
      (0 until m).map { s =>
        val c = codes(s).toInt
        (0 until dsub).map { j =>
          val d = q(s * dsub + j) - cents((s * k + c) * dsub + j); d * d
        }.sum
      }.sum
    def run(): Seq[(Seq[Long], Long)] = vecs.map(_._1).toDF("q")
      .select(EmbedFunctions.pq_encode($"q", cents, m, k, dsub).as("codes"),
        EmbedFunctions.pq_adc(
          EmbedFunctions.pq_dtable($"q", cents, m, k, dsub),
          EmbedFunctions.pq_encode($"q", cents, m, k, dsub), k).as("ad2"))
      .collect().map(r => (r.getSeq[Long](0).toSeq, r.getLong(1))).toSeq
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = run()
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val fused = run()
      assert(interp == fused)
      val want = vecs.map(_._1).map { q =>
        val codes = oracleEncode(q)
        (codes, oracleAdc(q, codes))
      }
      assert(interp == want)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
    // ADC of a vector's own codes lower-bounds nothing but must equal
    // the dtable lookups exactly: self-consistency already covered —
    // also check a tie resolves to the SMALLEST index (two identical
    // centroids): c1 == c2 in a doctored codebook
    val tieCents = cents.clone()
    for (j <- 0 until dsub) // make centroid 2 of subspace 0 == centroid 1
      tieCents((0 * k + 2) * dsub + j) = tieCents((0 * k + 1) * dsub + j)
    val tied = vecs.take(5).map(_._1).toDF("q")
      .select(EmbedFunctions.pq_encode($"q", tieCents, m, k, dsub))
      .collect().map(_.getSeq[Long](0).head)
    assert(!tied.contains(2L), "equidistant sub-centroids must pick the smaller index")
  }

  test("packed PQ codes: BINARY of exactly m bytes, identical indices and ADC") {
    val m = 8; val k = 16; val dsub = 4
    val cents = Array.tabulate(m * k * dsub) { f =>
      val s = f / (k * dsub); val c = (f / dsub) % k
      (s * 7 + c * 5 - 11).toLong
    }
    def run(): Seq[(Seq[Long], Array[Byte], Long, Long)] = vecs.map(_._1)
      .map(_.take(m * dsub)).toDF("q")
      .select(EmbedFunctions.pq_encode($"q", cents, m, k, dsub).as("codes"),
        EmbedFunctions.pq_encode_packed($"q", cents, m, k, dsub).as("packed"),
        EmbedFunctions.pq_adc(
          EmbedFunctions.pq_dtable($"q", cents, m, k, dsub),
          EmbedFunctions.pq_encode($"q", cents, m, k, dsub), k).as("ad2"),
        EmbedFunctions.pq_adc_packed(
          EmbedFunctions.pq_dtable($"q", cents, m, k, dsub),
          EmbedFunctions.pq_encode_packed($"q", cents, m, k, dsub), k).as("pad2"))
      .collect()
      .map(r => (r.getSeq[Long](0).toSeq, r.getAs[Array[Byte]](1),
        r.getLong(2), r.getLong(3))).toSeq
    def checkAll(rows: Seq[(Seq[Long], Array[Byte], Long, Long)]): Unit =
      for ((codes, packed, ad2, pad2) <- rows) {
        assert(packed.length == m, "code column must be exactly m bytes")
        assert(packed.map(b => (b & 0xff).toLong).toSeq == codes,
          "packed indices must equal the ARRAY encode")
        assert(pad2 == ad2, "packed ADC must equal array ADC")
      }
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = run()
      checkAll(interp)
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val fused = run()
      checkAll(fused)
      assert(interp.map(t => (t._1, t._2.toSeq, t._3, t._4)) ==
        fused.map(t => (t._1, t._2.toSeq, t._3, t._4)))
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }

  test("dimension mismatch fails loudly") {
    val df = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    intercept[Exception] {
      df.select(EmbedFunctions.vec_dot($"a", $"b")).collect()
    }
  }
}
