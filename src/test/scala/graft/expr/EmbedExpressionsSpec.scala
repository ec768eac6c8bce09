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

  test("dimension mismatch fails loudly") {
    val df = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    intercept[Exception] {
      df.select(EmbedFunctions.vec_dot($"a", $"b")).collect()
    }
  }
}
