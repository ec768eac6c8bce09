package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal access bridge: Column ↔ Catalyst Expression conversion is
  * private[sql] in Spark 4 (classic.ExpressionUtils), so this one-file
  * shim re-exports just the two converters the graft expression layer
  * needs. No Spark behavior is modified. */
package object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
