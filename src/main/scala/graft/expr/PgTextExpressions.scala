package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL COPY-text unescape (public format: the COPY TO/FROM text
  * representation — backslash escapes \b \f \n \r \t \v \\, octal
  * \NNN, hex \xHH, and the bare NULL marker \N). Used by the apidb
  * dump interop reader (graft.norm.PgCopy). */
object PgTextRT {
  private val NullMarker = UTF8String.fromString("\\N")

  /** Returns null (Java) for the \N marker; unescaped text otherwise. */
  def pgUnescape(s: UTF8String): UTF8String = {
    if (s.equals(NullMarker)) return null
    val str = s.toString
    if (str.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c != '\\' || i == n - 1) { sb.append(c); i += 1 }
      else {
        str.charAt(i + 1) match {
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'v' => sb.append('\u000B'); i += 2
          case 'x' =>
            var j = i + 2; var v = 0; var d = 0
            while (j < n && d < 2 && Character.digit(str.charAt(j), 16) >= 0) {
              v = v * 16 + Character.digit(str.charAt(j), 16); j += 1; d += 1
            }
            if (d == 0) { sb.append('x'); i += 2 }
            else { sb.append(v.toChar); i = j }
          case o if o >= '0' && o <= '7' =>
            var j = i + 1; var v = 0; var d = 0
            while (j < n && d < 3 && str.charAt(j) >= '0' && str.charAt(j) <= '7') {
              v = v * 8 + (str.charAt(j) - '0'); j += 1; d += 1
            }
            sb.append(v.toChar); i = j
          case other => sb.append(other); i += 2 // \<c> → c per COPY spec
        }
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** pg_unescape(field) → STRING (null for the \N marker). */
case class PgUnescapeExpr(field: Expression) extends UnaryExpression {
  override def child: Expression = field
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(t: Any): Any =
    PgTextRT.pgUnescape(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.PgTextRT.pgUnescape($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  override protected def withNewChildInternal(c: Expression): PgUnescapeExpr = copy(c)
}

object PgTextFunctions {
  import org.apache.spark.sql.graftbridge.{column, expression}
  def pg_unescape(field: Column): Column = column(PgUnescapeExpr(expression(field)))
}
