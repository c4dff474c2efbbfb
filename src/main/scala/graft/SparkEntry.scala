package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the driver's parquet tables, with (where SQL can
  * express it) a DuckDB oracle that must hash-match at sf0.01. */
object SparkEntry {

  private val all: Seq[Q.Entry] =
    RelQueries.entries ++ StatQueries.entries ++ LlmQueries.entries ++
      StreamQueries.entries ++ PipelineQueries.entries ++ OmicsQueries.entries ++
      ExtQueries.entries ++ SampleQueries.entries ++ IoQueries.entries

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the queryMassNPDB pipeline (cross join → ppm range join → dedup). */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q_pipeline_massquery").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver records a weaker rows-only check; those ops carry golden
    * ScalaTests instead). */
  def oracleSql: Map[String, String] =
    all.collect { case Q.Entry(n, _, Some(sql)) => n -> sql }.toMap
}
