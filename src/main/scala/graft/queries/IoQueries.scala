package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import graft.io.Io
import Q.{Entry, t}

/** §2.1 ingestion shapes upgraded from test-only to REAL gate rows.
  *
  * Each query is a deterministic self-contained round trip: materialize
  * a fixture table through the Io reader/writer under test into a fresh
  * temp directory, read it back with the operator, and let the DuckDB
  * oracle state what the result must equal in terms of the ORIGINAL
  * parquet table — so the hash compare proves the ingestion path is
  * lossless, not merely that it runs. Only INT/VARCHAR columns ride the
  * text round trips (float formatting would be an engine-repr seam, and
  * the reference's CSV/TSV ingestion shapes are key/name-like columns
  * anyway). Temp dirs are per-invocation (UUID) so concurrent gate/bench
  * runs never collide; the written fixtures are row-order independent
  * because the gate sorts. */
object IoQueries {

  // one run-scoped temp ROOT, recursively deleted at JVM exit — repeated
  // Verify/Bench/ScaleCheck runs must not accumulate fixture copies in
  // the system temp dir forever (round-9 ADVICE). Per-invocation UUID
  // subdirs keep concurrent runs inside ONE JVM collision-free.
  private lazy val tmpRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_io_run")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p,
            java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      try rm(root) catch { case _: Throwable => () }
    }))
    root
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tmpRoot, s"graft_io_$tag")
      .toString

  private val nationSql =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation"

  val entries: Seq[Entry] = Seq(

    Entry("q_io_csv_noheader",
      // headerless CSV with caller-supplied names (pandas names=[...]):
      // nation -> headerless CSV -> csvNoHeader must reproduce it
      (s, d) => {
        val dir = tmpDir("nohdr")
        t(s, d, "nation").write.mode("overwrite")
          .option("header", "false").csv(dir)
        Io.csvNoHeader(s, dir, Seq("n_nationkey", "n_name", "n_regionkey"))
      },
      Some(nationSql)),

    Entry("q_io_tsv_comments",
      // TSV with '#' comment lines (chem_prop.tsv shape): the file is
      // assembled BY HAND with comments interleaved between data rows,
      // so the comment-skip path is genuinely exercised
      (s, d) => {
        val rows = t(s, d, "nation")
          .orderBy("n_nationkey").collect() // 25 rows, driver-safe
        val lines = Seq("# generated fixture", "# second comment line",
          "n_nationkey\tn_name\tn_regionkey") ++
          rows.zipWithIndex.flatMap { case (r, i) =>
            val row = s"${r.get(0)}\t${r.get(1)}\t${r.get(2)}"
            if (i % 7 == 3) Seq(s"# interleaved comment $i", row)
            else Seq(row)
          }
        val f = java.nio.file.Path.of(tmpDir("tsv"), "nation.tsv")
        java.nio.file.Files.write(f,
          String.join("\n", lines: _*).getBytes("UTF-8"))
        Io.tsvWithComments(s, f.toString)
      },
      Some(nationSql)),

    Entry("q_io_csv_schema",
      // SQL->CSV export then the dtype-forcing scan (explicit schema,
      // NO inference — the only scale-sane default) reads it back
      (s, d) => {
        val dir = tmpDir("schema")
        Io.exportCsv(t(s, d, "nation"), dir)
        Io.csvWithSchema(s, dir, StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType))))
      },
      Some(nationSql)),

    Entry("q_io_append",
      // the append sink contract (to_sql(if_exists="append") / header-
      // once CSV append, re-expressed as parquet append): two appends of
      // region must read back as exactly the doubled relation
      (s, d) => {
        val dir = tmpDir("append") + "/regions"
        val region = t(s, d, "region")
        Io.appendParquet(region, dir)
        Io.appendParquet(region, dir)
        s.read.parquet(dir)
      },
      Some("SELECT * FROM region UNION ALL SELECT * FROM region")),

    Entry("q_io_jdbc",
      // the reference's SQLite-with-SQL first touch, gated live: build a
      // file database from the fixture parquet, run the LEFT JOIN +
      // WHERE INSIDE the database via the derived-table JDBC scan, and
      // oracle the same SQL over the parquet views — equality proves the
      // in-database execution path end to end. DuckDB-over-JDBC is the
      // embedded stand-in for sqlite-jdbc (same file-database,
      // in-process-driver shape); the driver jar rides the run classpath
      // from the image's artifact cache (see build.sbt).
      (s, d) => {
        require(
          try { Class.forName("org.duckdb.DuckDBDriver"); true }
          catch { case _: Throwable => false },
          "q_io_jdbc: duckdb_jdbc driver not on the run classpath")
        val dbPath = java.nio.file.Path.of(tmpDir("jdbc"), "fix.duckdb")
          .toString
        val url = s"jdbc:duckdb:$dbPath"
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          st.execute(s"CREATE TABLE nation AS SELECT * FROM read_parquet('$d/nation.parquet')")
          st.execute(s"CREATE TABLE region AS SELECT * FROM read_parquet('$d/region.parquet')")
          st.close()
        } finally conn.close()
        Io.readJdbc(s, url,
          "SELECT n.n_nationkey, n.n_name, r.r_name AS region_name " +
            "FROM nation n LEFT JOIN region r " +
            "ON n.n_regionkey = r.r_regionkey WHERE n.n_nationkey < 20")
      },
      Some("SELECT CAST(n.n_nationkey AS BIGINT) AS n_nationkey, n.n_name, r.r_name AS region_name " +
        "FROM nation n LEFT JOIN region r " +
        "ON n.n_regionkey = r.r_regionkey WHERE n.n_nationkey < 20")),

    Entry("q_io_stride",
      // TCGA-style stride-select (every 4th column from offset 1, plus
      // the kept key column) — lineitem's column order is fixed by the
      // fixture, so the oracle can name the strided columns directly
      (s, d) => Io.strideSelect(t(s, d, "lineitem"),
        keep = Seq("l_orderkey"), stride = 4, offset = 1),
      Some("SELECT l_orderkey, l_partkey, l_extendedprice, l_linestatus " +
        "FROM lineitem")),

    Entry("q_io_rda",
      // the R-workspace round trip (Download_Preprocess.R:686-702 load;
      // the reference ships its fixtures as rda): nation -> RDX2
      // data.frame via the native writer -> read back through the
      // native reader (graft.io.Rda) — the oracle states the result
      // must equal the original parquet relation, so the hash compare
      // proves the serialization path lossless. The reader itself is
      // additionally proven against R-PRODUCED bytes in RdaSpec (all 13
      // reference rda files: xz/bzip2, factors, matrices, S4, ALTREP).
      (s, d) => {
        val path = java.nio.file.Path.of(tmpDir("rda"), "nation.rda").toString
        graft.io.Rda.writeDataFrame(
          t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey"),
          path, "nation")
        graft.io.Rda.dataFrame(s, path, "nation")
      },
      Some(nationSql)))
}
