package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Typed readers/writers for every SURVEY §2.1 ingestion shape the
  * reference uses. All return lazy DataFrames (scans prune/push down
  * normally); nothing infers schema twice.
  */
object Io {

  /** Headered CSV whose columns are renamed BY POSITION to canonical names
    * (pandas `df.columns = [...]`; gizmos.py:640-644,
    * heraldPathways.py:204-227, queryMassNPDB.py:108). The file's own
    * header is read only to establish column count/order, then discarded. */
  def csvPositional(spark: SparkSession, path: String, names: Seq[String],
                    delimiter: String = ","): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("sep", delimiter)
      .csv(path)
    require(raw.columns.length >= names.length,
      s"csvPositional: file has ${raw.columns.length} columns, need ${names.length}")
    raw.toDF(names ++ raw.columns.drop(names.length): _*)
  }

  /** Headerless CSV with caller-supplied names (pandas `names=[...]`;
    * getMassTransitions.py:47, read_merge_dataframe.py:18-22). */
  def csvNoHeader(spark: SparkSession, path: String, names: Seq[String],
                  delimiter: String = ","): DataFrame =
    spark.read.option("header", "false").option("inferSchema", "true")
      .option("sep", delimiter).csv(path).toDF(names: _*)

  /** TSV with '#' comment lines (chem_prop.tsv shape;
    * getMassTransitions.py:47, validateRulesWithOrigins.py:97-99). */
  def tsvWithComments(spark: SparkSession, path: String,
                      comment: String = "#", header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("inferSchema", "true")
      .option("sep", "\t").option("comment", comment).csv(path)

  /** dtype-forcing scan: explicit StructType, NO inference (pandas
    * `dtype={...}`; heraldPathways.py:145-147, mapBaseRetroRules.py:157-158).
    * Inference on 100 TB means scanning twice — this is also the only
    * scale-sane default. */
  def csvWithSchema(spark: SparkSession, path: String, schema: StructType,
                    header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.option("header", header.toString).option("sep", delimiter)
      .schema(schema).csv(path)

  /** Append sink (DataFrame.to_sql(if_exists="append") /
    * header-once CSV append; queryMassNPDB_mod.py:151,
    * heraldPathways.py:505-522). Parquet append is the scale-correct
    * replacement — the header-once concern disappears. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** CSV export of a SQL result (queryMassNPDB_mod.py:56-72). */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Write a table bucketed+sorted by join keys: two tables bucketed the
    * same way join with ZERO exchanges — the pre-shuffled layout for hot
    * co-located joins (the 100 TB answer to repeatedly joining the same
    * keys; verified exchange-free in IoMultimodalSpec). Requires a table
    * name because bucketing metadata lives in the catalog. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, path: Option[String] = None): Unit = {
    // drop a stale catalog entry first: `overwrite` only replaces a table
    // the CURRENT session's catalog knows about — a leftover managed
    // location from an earlier session fails with LOCATION_ALREADY_EXISTS
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
    // explicit path = external table at a caller-owned location (what a
    // lake deployment does anyway); default stays the managed warehouse
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** JDBC source for the reference's SQLite-first ingestion
    * (queryMassNPDB.py:33-40, getMassTransitions.py:62-86,
    * validateRulesWithOrigins.py:48-57 — each pipeline's first touch is a
    * SQL query against a local DB). `sql` runs DB-side as a derived-table
    * subquery, so the WHERE/LEFT JOIN the reference pushes into SQLite
    * stays pushed; predicates Spark later adds on top are pushdown-eligible
    * too (JDBCRelation implements unhandledFilters — audit with
    * PushedFilters in .explain, same as a parquet scan).
    *
    * Partitioned-read knobs are deliberately surfaced: an unpartitioned
    * JDBC scan is ONE task reading the whole table through one connection —
    * the classic cluster-scale trap. Pass (partitionCol, lo, hi, n) for any
    * table that is not dimension-sized.
    *
    * Live-tested via DuckDB-over-JDBC (JdbcSpec: in-database LEFT
    * JOIN + WHERE, Spark filter pushdown onto the derived table,
    * partitioned parallel scan, append sink) — the same file-database
    * in-process-driver shape as the reference's sqlite3 first touch;
    * any other driver (sqlite-jdbc, postgres, ...) drops in by URL. */
  def readJdbc(spark: SparkSession, url: String, sql: String,
               partitioning: Option[(String, Long, Long, Int)] = None,
               driver: Option[String] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      // derived-table form rather than dbtable=name: the reference's
      // first-touch queries ARE SQL, not tables
      .option("dbtable", s"($sql) AS q")
    val withDriver = driver.fold(base)(d => base.option("driver", d))
    partitioning.fold(withDriver) { case (c, lo, hi, n) =>
      withDriver.option("partitionColumn", c)
        .option("lowerBound", lo.toString)
        .option("upperBound", hi.toString)
        .option("numPartitions", n.toString)
    }.load()
  }

  /** Compact a directory of (possibly many small) parquet files into
    * ~`targetBytes` output files — the standard lake maintenance pass
    * after streaming/append ingestion (the idempotent foreachBatch sink
    * produces one directory per micro-batch; a 100 TB table read through
    * thousands of tiny files pays open/footer costs per file and starves
    * the scheduler). Uses the INPUT byte size to pick the output file
    * count, coalesce (no shuffle) when narrowing. Writes to `outDir`
    * (never in place — the swap is the caller's atomic step). */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long = 128L << 20): Unit = {
    val df = spark.read.parquet(inDir)
    val inBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nOut = math.max(1,
      (inBytes / BigInt(math.max(1L, targetBytes))).toInt +
        (if (inBytes % BigInt(math.max(1L, targetBytes)) > 0) 1 else 0))
    df.coalesce(nOut).write.mode("overwrite").parquet(outDir)
  }

  /** Stride-select every `stride`-th column starting at `offset` (TCGA flat
    * files carry 4 columns per sample and the loader keeps every 4th;
    * Download_Preprocess.R:686-702). */
  def strideSelect(df: DataFrame, keep: Seq[String], stride: Int,
                   offset: Int): DataFrame = {
    val strided = df.columns.zipWithIndex
      .collect { case (c, i) if i >= offset && (i - offset) % stride == 0 => c }
    df.select((keep ++ strided.filterNot(keep.contains)).map(df.col): _*)
  }
}
