package graft
import org.apache.spark.sql.SparkSession

/** Codegen-strict smoke runner: executes every registered query with
  * `spark.sql.codegen.fallback=false`, so malformed generated Java fails
  * the run instead of silently demoting the stage to interpreted eval
  * (which is how the MassKeepExpr margin-strip bug hid: results stayed
  * correct while the hot path lost whole-stage codegen). Run after any
  * change to a `doGenCode` template: `sbt "runMain graft.CgCheck"`. */
object CgCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.foreach { n =>
      try {
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(s"[cg] $n OK rows=$c")
      } catch { case e: Throwable =>
        failed += 1
        println(s"[cg] $n FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    println(s"[cg] failed=$failed")
    spark.stop()
  }
}
