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

  /** The melted (col_name, num, str, repr, is_null) relation both
    * profilers aggregate — one generated projection, one scan. */
  private def melted(df: DataFrame): DataFrame = {
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
  }

  /** @return one row per column: (col_name, n, n_null, n_distinct,
    *         min_num, max_num, min_str, max_str). */
  def profile(df: DataFrame): DataFrame =
    melted(df)
      .groupBy("col_name")
      .agg(count(lit(1)).as("n"),
        sum(col("is_null").cast("long")).as("n_null"),
        // 100 TB: approx_count_distinct(col("repr")) here — or use
        // [[profileKmv]], whose sketch is bounded AND mergeable
        countDistinct(col("repr")).as("n_distinct"),
        min(col("num")).as("min_num"), max(col("num")).as("max_num"),
        min(col("str")).as("min_str"), max(col("str")).as("max_str"))

  private val Two60 = 1152921504606846976.0 // the 60-bit draw's range

  private def withEstimate(grouped: DataFrame, k: Int): DataFrame =
    grouped
      .withColumn("n_mins", size(col("kmv")))
      .withColumn("est_distinct",
        when(col("n_mins") < k, col("n_mins").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(Two60) /
            element_at(col("kmv"), col("n_mins")), 2)))

  /** The MERGEABLE profile: exact n/n_null/ranges plus a bounded KMV
    * sketch ([[graft.catalyst.KmvSketchAgg]] — ≤ k longs of buffer,
    * map-side partial combine) in place of the exact distinct count.
    * Every output component is order-independent and mergeable, so
    * profiles of corpus slices ROLL UP: [[mergeKmvProfiles]] of the
    * slice profiles is EXACTLY the whole-table profile — the
    * incremental-snapshot shape (profile the daily delta, merge into
    * the running profile; never rescan the lake).
    *
    * The sketch hashes the value's string form with the shared md5
    * 60-bit draw. Caveat: cross-engine estimate parity needs
    * repr-parity of the hashed strings (integers, strings, dates,
    * 2-decimal doubles and sub-1e7 magnitudes are safe; exotic float
    * magnitudes format differently across engines — the COUNT parity
    * of [[profile]]'s exact path does not have this caveat).
    *
    * @return one row per column: (col_name, n, n_null, min_num,
    *         max_num, min_str, max_str, kmv, n_mins, est_distinct). */
  def profileKmv(df: DataFrame, k: Int = 64): DataFrame = {
    val h = conv(substring(md5(concat(lit("pf:"), col("repr"))), 1, 15),
      16, 10).cast("long")
    withEstimate(
      melted(df)
        .groupBy("col_name")
        .agg(count(lit(1)).as("n"),
          sum(col("is_null").cast("long")).as("n_null"),
          min(col("num")).as("min_num"), max(col("num")).as("max_num"),
          min(col("str")).as("min_str"), max(col("str")).as("max_str"),
          graft.catalyst.SketchFunctions.kmvSketch(h, k).as("kmv")),
      k)
  }

  /** Schema/distribution drift between two [[profile]] outputs (the
    * before/after of a pipeline change or snapshot refresh): classifies
    * every column as added / removed / kept and, for kept columns,
    * reports the count/null/cardinality deltas, numeric range shifts,
    * and whether the string range moved. One full outer join on the
    * column name — profile-sized, not data-sized, so diffing two 100 TB
    * snapshots costs two profile scans plus this epsilon. */
  def drift(base: DataFrame, cur: DataFrame): DataFrame = {
    def side(p: DataFrame, tag: String) = p.select(
      col("col_name"), col("n").as(s"${tag}_n"),
      col("n_null").as(s"${tag}_null"),
      col("n_distinct").as(s"${tag}_distinct"),
      col("min_num").as(s"${tag}_min_num"),
      col("max_num").as(s"${tag}_max_num"),
      col("min_str").as(s"${tag}_min_str"),
      col("max_str").as(s"${tag}_max_str"))
    val j = side(base, "b").join(side(cur, "c"), Seq("col_name"), "full")
    val kept = col("b_n").isNotNull && col("c_n").isNotNull
    j.select(col("col_name"),
      when(col("b_n").isNull, "added")
        .when(col("c_n").isNull, "removed").otherwise("kept").as("status"),
      when(kept, col("c_n") - col("b_n")).as("n_delta"),
      when(kept, col("c_null") - col("b_null")).as("null_delta"),
      when(kept, col("c_distinct") - col("b_distinct")).as("distinct_delta"),
      when(kept, round(col("c_min_num") - col("b_min_num"), 6))
        .as("min_num_delta"),
      when(kept, round(col("c_max_num") - col("b_max_num"), 6))
        .as("max_num_delta"),
      when(kept,
        coalesce(col("c_min_str") =!= col("b_min_str"), lit(false)) ||
          coalesce(col("c_max_str") =!= col("b_max_str"), lit(false)))
        .as("str_range_changed"))
  }

  /** Roll up per-slice [[profileKmv]] outputs into the union's profile —
    * bit-identical to profiling the union directly: counts sum, ranges
    * re-min/max (nulls ignored, so a column numeric in no slice stays
    * null), and the sketch union re-takes the k smallest distinct
    * hashes, which IS the union's KMV sketch. */
  def mergeKmvProfiles(profiles: DataFrame, k: Int = 64): DataFrame =
    withEstimate(
      profiles
        .groupBy("col_name")
        .agg(sum(col("n")).as("n"), sum(col("n_null")).as("n_null"),
          min(col("min_num")).as("min_num"),
          max(col("max_num")).as("max_num"),
          min(col("min_str")).as("min_str"),
          max(col("max_str")).as("max_str"),
          slice(array_sort(array_distinct(flatten(
            collect_list(col("kmv"))))), 1, k).as("kmv")),
      k)
}
