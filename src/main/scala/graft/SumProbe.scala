package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe for the suite's hottest per-task kernel: the exact
  * decimal sum (Exact.sumDec/sumDec6, the oracle-parity primitive under
  * most corpus aggregates). sum(DECIMAL(18,2)) carries a DECIMAL(28,2)
  * result type, which exceeds the compact-long Decimal domain (18
  * digits), so every aggregation buffer update goes through the
  * non-compact 128-bit path. The candidate replacement keeps the CAST
  * (the rounding semantics live there) but scales to an exact LONG in
  * the projection and sums primitive longs: identical values whenever
  * the scaled sum fits a long (|sum| < 9.2e16 at 2 decimals — checked by
  * the caller's domain), ~the cost of a plain double sum.
  *
  * Usage: runMain graft.SumProbe <sfDir> [reps]
  */
object SumProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.count() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[sumprobe] $name%-28s min=${ts.min}%.3f s  raws=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val c = col("l_extendedprice")
    time("sum_decimal_18_2") {
      li.groupBy("l_partkey", "l_suppkey")
        .agg(sum(c.cast("decimal(18,2)")).cast("double").as("r"))
    }
    time("sum_long_scaled") {
      li.groupBy("l_partkey", "l_suppkey")
        .agg((sum((c.cast("decimal(18,2)") * 100).cast("long"))
          .cast("double") / 100.0).as("r"))
    }
    time("sum_double_raw") {
      li.groupBy("l_partkey", "l_suppkey").agg(sum(c).as("r"))
    }
    // value-identity spot check: the two exact forms must agree bitwise
    val a = li.groupBy("l_partkey", "l_suppkey")
      .agg(sum(c.cast("decimal(18,2)")).cast("double").as("r"))
    val b = li.groupBy("l_partkey", "l_suppkey")
      .agg((sum((c.cast("decimal(18,2)") * 100).cast("long"))
        .cast("double") / 100.0).as("r"))
    val diff = a.join(b, Seq("l_partkey", "l_suppkey"))
      .where(a("r") =!= b("r")).count()
    println(s"[sumprobe] bitwise mismatches decimal-vs-longscaled: $diff")
    spark.stop()
  }
}
