package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway profiling harness (not part of the library surface)
object DebugProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    time("warmup")(li.count())

    val data = li.select(
      (col("l_partkey") % 50).cast("string").as("gene"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("sample"),
      col("l_extendedprice").as("value"))
    val batches = li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("sample"))
      .distinct()
      .withColumn("batch", concat(lit("b"), (col("sample") % 3).cast("string")))
    time("batches distinct")(batches.count())
    val z = graft.omics.Combat.standardized(data, batches)
    time("z")(z.count())
    val adj = graft.omics.Combat.adjust(data, batches)
    time("adjust full")(adj.count())
    time("adjust again")(adj.count())
    spark.stop()
  }
}
