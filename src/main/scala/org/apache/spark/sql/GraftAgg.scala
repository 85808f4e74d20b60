package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK

/** Same role as [[GraftColumn]] for the one `private[sql]` aggregate
  * graft uses: `CollectTopK`, Spark's bounded-heap top-k collector
  * (the engine primitive behind pandas-API nlargest). Only the
  * constructor is re-exposed; no internals are re-implemented.
  */
object GraftAgg {
  def collectTopK(child: Expression, k: Int, reverse: Boolean): Expression =
    new CollectTopK(child, k, reverse).toAggregateExpression()
}
