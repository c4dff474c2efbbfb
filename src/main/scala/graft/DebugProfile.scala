package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    time("warmup")(li.count())

    val e0 = li.groupBy("l_partkey", "l_suppkey")
      .agg(graft.queries.Q.sumDec(col("l_quantity")).as("r"))
      .select(concat(lit("p"), col("l_partkey").cast("string")).as("src"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("dst"), col("r"))
    time("e0")(e0.count())
    val edges = e0.select(explode(array(
        struct(col("src").as("s"), col("dst").as("d"), col("r").as("r")),
        struct(col("dst").as("s"), col("src").as("d"), col("r").as("r"))))
      .as("e")).select(col("e.s").as("src"), col("e.d").as("dst"), col("e.r").as("r"))
    time("edges")(edges.count())
    val w = Window.partitionBy(col("src")).orderBy(col("r").desc, col("dst"))
    val ranked = edges.withColumn("rank", row_number().over(w))
    time("ranked")(ranked.count())
    val paired = ranked
      .where(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
        when(col("src") < col("dst"), col("r")).as("__r"),
        when(col("src") < col("dst"), col("rank")).as("__rab"),
        when(col("src") > col("dst"), col("rank")).as("__rba"))
      .groupBy("a", "b")
      .agg(max(col("__r")).as("r"), max(col("__rab")).as("rank_ab"),
        max(col("__rba")).as("rank_ba"))
      .where(col("rank_ab").isNotNull && col("rank_ba").isNotNull)
    time("paired")(paired.count())
    val full = graft.stats.Stats.mutualRank(edges, "src", "dst", "r")
      .where(col("weight") >= 0.8)
    time("full wcmodules")(full.count())
    time("full again")(full.count())
    spark.stop()
  }
}
