package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst `Expression`s and the public `Column`
  * API. Spark 4 made the classic converters `private[sql]`, so this
  * one-file shim lives under the org.apache.spark.sql namespace — the
  * standard pattern for Spark extension libraries that define native
  * expressions (no Spark internals are modified, only re-exported).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
