package graft
import org.apache.spark.sql.SparkSession
object KmProbe {
  def main(args: Array[String]): Unit = {
    val wsc = args(1).toBoolean
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.wholeStage", wsc.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the session on an unrelated query
    SparkEntry.queries("q_scan_prune")(spark, args(0)).collect()
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_cluster_profile")(spark, args(0)).collect()
      println(f"wholeStage=$wsc q_cluster_profile ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
