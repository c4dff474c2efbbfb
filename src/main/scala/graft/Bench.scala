package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. A failing query is reported as an explicit error
  * entry (value -1) — never silently folded into a timing (a broken query
  * must be distinguishable from a slow one in BENCH_r*.json). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen/FS-cache warmup so the first timed query is not charged
    // for JVM startup costs
    Seq("lineitem", "orders", "part", "customer", "supplier",
      "nation", "region", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        (name, Right((System.nanoTime() - t0) / 1e9))
      } catch {
        case e: Throwable =>
          val msg = e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").take(160)
          (name, Left(msg))
      }
    }
    val qs = results.map {
      case (k, Right(v)) => s""""${esc(k)}":$v"""
      case (k, Left(_))  => s""""${esc(k)}":-1"""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) =>
      s""""${esc(k)}":"${esc(m)}""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
