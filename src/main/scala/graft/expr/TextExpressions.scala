package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels for the training-data pipeline operators (dedup,
  * fingerprinting). The polynomial hash is defined over UNICODE CODE
  * POINTS with h = (h*31 + cp) mod 1e9+7, seed 7 — chosen so the exact
  * same function is expressible in ANSI SQL for the DuckDB oracle
  * (list_reduce over regexp_split_to_array + unicode()). */
object TextRT {
  val P = 1000000007L
  val Seed = 7L

  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = Seed
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** str_poly_hash(text) → BIGINT in [0, 1e9+7). Deterministic document
  * fingerprint (SURVEY.md training-data ops); also the shared hash
  * primitive under minhash/simhash. */
case class StrPolyHashExpr(text: Expression) extends UnaryExpression {
  override def child: Expression = text
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    TextRT.polyHash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextRT.polyHash($c)")
  override protected def withNewChildInternal(c: Expression): StrPolyHashExpr = copy(c)
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.{column, expression}

  def str_poly_hash(text: Column): Column =
    column(StrPolyHashExpr(expression(text)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "str_poly_hash", es => StrPolyHashExpr(es.head), "built-in")
}
