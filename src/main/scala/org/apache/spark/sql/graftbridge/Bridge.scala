package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal visibility bridge: Spark 4 made the Expression <-> Column
 * conversions `private[sql]` (org.apache.spark.sql.classic
 * .ExpressionUtils), so the engine's Column-level API for its custom
 * Catalyst expressions (graft.expr) goes through this shim, which is
 * the library-standard pattern for Spark-native extensions.
 */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
