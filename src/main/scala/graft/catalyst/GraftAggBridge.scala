package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** `CollectTopK` is `private[aggregate]`; this one-line forwarder lives
  * in that package (the same extension technique as
  * [[org.apache.spark.sql.GraftColumnBridge]]) so graft's bounded
  * top-k-per-group operator can use Spark's own BoundedPriorityQueue
  * aggregate instead of reimplementing it. */
object GraftAggBridge {
  def collectTopK(child: Expression, k: Int, reverse: Boolean): CollectTopK =
    CollectTopK(child, k, reverse)
}
