package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the driver-facing query registry.
  *
  * Oracle-parity discipline (the driver hash-compares against DuckDB):
  *  - sums of money-like doubles go through DECIMAL(18,2) (exact, order
  *    independent) and are cast back to double;
  *  - means are computed as exact-decimal-sum / count in double on BOTH
  *    sides (never the engines' own avg-of-decimal, whose internal rounding
  *    differs);
  *  - every remaining double output is round(x, 6) — UNLESS the value's
  *    magnitude pushes a double's ulp near or past the rounding grid
  *    (|x| ≳ 1e4 for 6 decimals: ulp(1e5) = 1.5e-11): there the decimal
  *    mimic is unsound because Java's pre-19 Double.toString is not
  *    always shortest, so Spark and DuckDB can round two DIFFERENT
  *    decimal spellings of the same double (q_combat_fixed lost 1 row in
  *    600k this way at sf0.1). Large-magnitude outputs use the
  *    string-free quantizer floor(x*1e6+0.5)/1e6 on BOTH sides — the
  *    same IEEE sequence, bit-identical regardless of representation;
  *  - timestamps are never emitted raw — epoch seconds as BIGINT;
  *  - divisions are guarded (`nullif` in SQL, `when` here) so both engines
  *    yield NULL rather than one erroring.
  */
object Q {
  /** A registered query: name, Spark implementation, optional DuckDB oracle
    * (None → the driver records a weaker rows-only check). */
  final case class Entry(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark reads only as a
    * long (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench).
    * Exposes `ts` truncated to a microsecond timestamp (what a native Spark
    * reader would hold) plus `ts_ns` for exact ordering. */
  def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Exact order-independent sum of a 2-decimal money column, as double. */
  def sumDec(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact sum at 6 decimals (for arbitrary-precision doubles). */
  def sumDec6(c: Column): Column = sum(c.cast("decimal(24,6)")).cast("double")

  def r6(c: Column): Column = round(c, 6)
}
