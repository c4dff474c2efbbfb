package graft
import org.apache.spark.sql.SparkSession

/** Print one registered query's full physical plan (AQE off, line width
  * capped) — the drill-down companion to [[PlanAudit]]'s counters.
  * Usage: runMain graft.PlanDump <sfDir> <queryName>. Reading the plan
  * beats reasoning about it: the round-9 hot-band-guard rework looked
  * exchange-neutral on paper, but the dump showed per-consumer column
  * pruning had defeated exchange reuse and the minhash sketch kernel
  * ran once per consumer. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = SparkEntry.queries(args(1))(spark, args(0))
      .queryExecution.executedPlan.toString
    println(plan.linesIterator.map(_.take(150)).mkString("\n"))
    spark.stop()
  }
}
