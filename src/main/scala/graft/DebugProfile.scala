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
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    time("warmup")(li.count())

    val masses = li.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("ms_id"),
      (col("l_extendedprice") / when(col("l_quantity") =!= 0, col("l_quantity"))).as("mz"))
    val adducts = Seq(("2M", 2.0, 0.0, 0), ("M+0", 1.0, 0.0, 1), ("M+10", 1.0, 10.0, 2))
      .toDF("adduct", "mult", "mass", "__ord")
    val withMm = masses.crossJoin(broadcast(adducts))
      .withColumn("mm", (col("mz") - col("mass")) / col("mult"))
      .where(col("mm") > 0)
    val structs = spark.read.parquet(s"$d/part.parquet")
      .select(col("p_partkey").as("struct_id"), col("p_retailprice").as("monoisotopic_mass"))
    val joined = graft.ops.RangeJoin.ppmJoin(withMm, structs, "mm", "monoisotopic_mass", 500.0)
    time("mq joined")(joined.count())
    val dd = joined.groupBy("ms_id", "struct_id").agg(
      min(col("__ord")).as("__w"),
      min(when(col("__ord") === 0, col("mm"))).as("__mm0"),
      min(when(col("__ord") === 1, col("mm"))).as("__mm1"),
      min(when(col("__ord") === 2, col("mm"))).as("__mm2"),
      min(col("monoisotopic_mass")).as("monoisotopic_mass"))
    time("mq agg")(dd.count())
    dd.explain("formatted")
    spark.stop()
  }
}
