package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Spark 4's unified `Column` no longer exposes catalyst `Expression`s
  * publicly; the classic bridge (`ExpressionUtils`) is `private[sql]`.
  * This object lives inside the `org.apache.spark.sql` namespace purely
  * to re-export the two conversions custom expressions need.
  *
  * `expression` converts EAGERLY via the classic converter —
  * `ExpressionUtils.expression` alone wraps the node in a lazy
  * `ColumnNodeExpression` placeholder, which stays Unevaluable when
  * planted into a FunctionRegistry builder result. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
