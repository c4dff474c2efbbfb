package graft
import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` output for registered queries to files —
  * the round-deliverable format (plans/rNN/<query>_{before,after}.txt).
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix> [query...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[explaindump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
