package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API.
  *
  * Spark 4 moved Expression↔Column conversion behind
  * `private[sql] org.apache.spark.sql.classic.ExpressionUtils`; this
  * one-file shim lives in `package org.apache.spark.sql` solely to
  * re-expose the two conversions graft's expressions (HmacSha256,
  * RollingHash, …) need. No Spark internals are re-implemented here.
  */
object GraftColumn {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column back to its catalyst Expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
