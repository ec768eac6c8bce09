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

  /** Returns null (Java) for the \\N marker; unescaped text otherwise.
    * BYTE-oriented: COPY's octal/hex escapes denote raw BYTES (a UTF-8
    * character may arrive as e.g. \\303\\251), so decoding walks the
    * UTF-8 bytes directly — never through Java chars. */
  def pgUnescape(s: UTF8String): UTF8String = {
    if (s.equals(NullMarker)) return null
    val bytes = s.getBytes
    val n = bytes.length
    var hasEscape = false
    var k = 0
    while (k < n && !hasEscape) { if (bytes(k) == '\\') hasEscape = true; k += 1 }
    if (!hasEscape) return s
    val out = new java.io.ByteArrayOutputStream(n)
    var i = 0
    while (i < n) {
      val c = bytes(i)
      if (c != '\\' || i == n - 1) { out.write(c); i += 1 }
      else {
        bytes(i + 1) match {
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'v' => out.write(0x0B); i += 2
          case 'x' =>
            var j = i + 2; var v = 0; var d = 0
            while (j < n && d < 2 && Character.digit(bytes(j).toChar, 16) >= 0) {
              v = v * 16 + Character.digit(bytes(j).toChar, 16); j += 1; d += 1
            }
            if (d == 0) { out.write('x'); i += 2 }
            else { out.write(v & 0xFF); i = j }
          case o if o >= '0' && o <= '7' =>
            var j = i + 1; var v = 0; var d = 0
            while (j < n && d < 3 && bytes(j) >= '0' && bytes(j) <= '7') {
              v = v * 8 + (bytes(j) - '0'); j += 1; d += 1
            }
            out.write(v & 0xFF); i = j
          case other => out.write(other); i += 2 // \<c> → c per COPY spec
        }
      }
    }
    UTF8String.fromBytes(out.toByteArray)
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
