/* Lives in Spark's package on purpose: Column↔Expression conversion became
 * private[sql] in Spark 4 (org.apache.spark.sql.classic.ExpressionUtils).
 * This is the minimal public bridge the graft custom expressions need —
 * equivalent to what Spark's own built-in function wrappers do. */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
