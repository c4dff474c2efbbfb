package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiler — the data-validation primitive a pipeline
  * runs on every ingested snapshot (row counts, null rates, cardinality,
  * ranges) before trusting it downstream.
  *
  * Shape: the table is melted once into (column, value) rows via a
  * single generated `explode(array(struct...))` projection — ONE scan of
  * the table regardless of column count, no per-column jobs — then one
  * aggregate per column name. The exact distinct count rides Spark's
  * two-phase distinct aggregation (partial collapse on (column, value)
  * first), so the exchange carries distinct pairs, not raw rows. At
  * 100 TB swap `countDistinct` for `approx_count_distinct` (HLL) — the
  * one line marked below — and the pass is fully map-side-combinable.
  *
  * Cross-engine parity: numeric (and timestamp, via epoch seconds)
  * ranges are emitted as doubles; string/date ranges as binary-collated
  * strings; each type family leaves the other's range columns NULL so
  * no engine-specific number formatting ever surfaces. The distinct
  * count is computed on the value's string form, which is injective per
  * engine — the COUNT matches even though the reprs differ. */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** @return one row per column: (col_name, n, n_null, n_distinct,
    *         min_num, max_num, min_str, max_str). */
  def profile(df: DataFrame): DataFrame = {
    val entries = df.schema.fields.map { f =>
      val c = col(f.name)
      // NTZ included: parquet isAdjustedToUTC=false surfaces as
      // TimestampNTZType; route it through a UTC-session LTZ cast so
      // epoch seconds match the oracle's epoch_us/1e6
      val isTs = f.dataType.isInstanceOf[TimestampType] ||
        f.dataType.isInstanceOf[TimestampNTZType]
      val num = f.dataType match {
        case dt if isNumeric(dt) => c.cast("double")
        case _ if isTs => c.cast("timestamp").cast("double") // epoch secs
        case _ => lit(null).cast("double")
      }
      val str = f.dataType match {
        case dt if isNumeric(dt) => lit(null).cast("string")
        case _ if isTs => lit(null).cast("string")
        case _ => c.cast("string")
      }
      struct(lit(f.name).as("col_name"), num.as("num"), str.as("str"),
        c.cast("string").as("repr"), c.isNull.as("is_null"))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name"), col("e.num"), col("e.str"),
        col("e.repr"), col("e.is_null"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n"),
        sum(col("is_null").cast("long")).as("n_null"),
        // 100 TB: approx_count_distinct(col("repr")) here
        countDistinct(col("repr")).as("n_distinct"),
        min(col("num")).as("min_num"), max(col("num")).as("max_num"),
        min(col("str")).as("min_str"), max(col("str")).as("max_str"))
  }
}
