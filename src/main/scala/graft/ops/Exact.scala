package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-parity exact-arithmetic helpers shared by query oracles and
  * pipeline code (the single home — duplicated copies of these recipes
  * drift independently and silently break oracle parity).
  *
  * A decimal-cast sum is order-independent (exact decimal addition), so
  * both engines land on the identical double regardless of shuffle or
  * aggregation order — the foundation of the means/sums rules in
  * [[graft.queries.Q]]'s scaladoc. */
object Exact {
  /** Exact sum at 2 fractional digits (currency/quantity columns). */
  def sumDec(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  /** Exact sum at 6 fractional digits (scores, rounded doubles). */
  def sumDec6(c: Column): Column = sum(c.cast("decimal(24,6)")).cast("double")
}
