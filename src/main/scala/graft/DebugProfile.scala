package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway profiling harness (not part of the library surface)
object DebugProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val orders = spark.read.parquet(s"$d/orders.parquet")
    time("warmup")(orders.count())
    val rows = orders.select(col("o_orderkey"))
    val existing = orders.where(col("o_orderkey") % 10 === 0)
      .select(graft.ops.Ids.candidate("o_orderkey", 42L, 0).as("vm_id"))
    time("cand md5")(rows.withColumn("vm_id", graft.ops.Ids.candidate("o_orderkey", 42L, 0)).count())
    val cand = rows.withColumn("vm_id", graft.ops.Ids.candidate("o_orderkey", 42L, 0))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vm_id")
    val windowed = cand.withColumn("__c", count(lit(1)).over(w))
      .withColumn("__winner", min(col("o_orderkey")).over(w))
    time("window")(windowed.count())
    val taken0 = existing.toDF("vm_id").distinct()
    time("taken distinct")(taken0.count())
    val joined = windowed.join(taken0.withColumn("__t", lit(true)), Seq("vm_id"), "left")
    time("window+join")(joined.count())
    time("full assignNewIds")(graft.ops.Ids.assignNewIds(rows, "o_orderkey", existing, maxAttempts = 2).count())
    time("full again")(graft.ops.Ids.assignNewIds(rows, "o_orderkey", existing, maxAttempts = 2).count())
    spark.stop()
  }
}
