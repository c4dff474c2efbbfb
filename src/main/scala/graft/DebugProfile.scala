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
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    time("emb count")(emb.count())
    time("sample collect")({
      val s = emb.select(col("embedding")).limit(20000)
        .as[Seq[Float]].collect()
      s.length.toLong
    })
    val q = emb.where(col("vec_id") < 5)
    val full = graft.sim.Similarity.ivfTopK(emb, q, "vec_id", "embedding", 3,
      nCells = 16, nProbe = 16)
    time("ivf full")(full.count())
    time("ivf again")(full.count())
    spark.stop()
  }
}
