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
      Some(nationSql)),

    Entry("q_io_kegg",
      // the KEGG REST chain of kegg.py:14-48 with the fetch stubbed by
      // the SURVEY §2.1 fixture contract (zero egress): build
      // kegg_list-shaped TSV lines and kegg_get-shaped FLAT-FORMAT
      // documents deterministically from lineitem, then run the real
      // parsers — pathwayList (TSV split), keyword filter ("repair",
      // kegg.py:19-22), and the 12-column section fill-forward +
      // GENE-payload split of Kegg.geneSection (kegg.py:33-44). The
      // oracle rebuilds the same documents in SQL and re-parses them
      // with last_value(IGNORE NULLS) over the line ordinality — so the
      // hash compare proves the sequential-section semantics, not just
      // that text was carried through.
      (s, d) => {
        val genes = t(s, d, "lineitem").select(
            (col("l_partkey") % 50).as("pw"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("gid"),
            concat(lit("G"), col("l_suppkey")).as("sym"),
            col("l_returnflag").as("dsc"))
          .distinct()
        val docs = genes.groupBy("pw")
          .agg(sort_array(collect_list(struct(col("gid"), col("sym"),
            col("dsc")))).as("gs"))
          .select(concat(lit("hsa"), col("pw")).as("doc_entry"),
            concat_ws("\n",
              concat(lit("ENTRY       hsa"), col("pw")),
              lit("NAME        synthetic pathway"),
              array_join(zip_with(col("gs"),
                sequence(lit(0), size(col("gs")) - 1),
                (g, i) => concat(
                  when(i === 0, lit("GENE        "))
                    .otherwise(lit("            ")),
                  g.getField("gid"), lit("  "), g.getField("sym"),
                  lit("; "), g.getField("dsc"))), "\n"),
              lit("///")).as("text"))
          // pathway-dimension-sized (one row per pw), but rooted in a
          // corpus-wide distinct: it feeds BOTH sides of the repair
          // semi-join, and the broadcast build evaluated the whole
          // distinct+collect subtree a second time, concurrently (round-15
          // JobProbe: two ~1 s 3-task jobs). Materialize the 50-row
          // relation once; at any scale this is bounded by pathway count.
          .localCheckpoint(false)
        val tsv = docs.select(concat(col("doc_entry"), lit("\t"),
          when(substring(col("doc_entry"), 4, 99).cast("int") % 3 === 0,
            concat(lit("base excision repair - "), col("doc_entry")))
            .otherwise(concat(lit("fatty acid metabolism - "),
              col("doc_entry")))).as("line"))
        val repair = graft.io.Kegg.pathwayList(tsv, "line")
          .where(col("description").contains("repair"))
        graft.io.Kegg.geneSection(
          docs.join(repair, col("doc_entry") === col("entry"), "left_semi"),
          "doc_entry", "text")
      },
      Some("""WITH genes AS (SELECT DISTINCT l_partkey % 50 AS pw, l_orderkey * 10 + l_linenumber AS gid, 'G' || CAST(l_suppkey AS VARCHAR) AS sym, l_returnflag AS dsc FROM lineitem), gl AS (SELECT pw, gid, CASE WHEN row_number() OVER (PARTITION BY pw ORDER BY gid, sym, dsc) = 1 THEN 'GENE        ' ELSE '            ' END || CAST(gid AS VARCHAR) || '  ' || sym || '; ' || dsc AS line FROM genes), docs AS (SELECT 'hsa' || CAST(pw AS VARCHAR) AS doc_entry, 'ENTRY       hsa' || CAST(pw AS VARCHAR) || chr(10) || 'NAME        synthetic pathway' || chr(10) || string_agg(line, chr(10) ORDER BY gid) || chr(10) || '///' AS text, pw FROM gl GROUP BY pw), rep AS (SELECT doc_entry, text FROM docs WHERE pw % 3 = 0), lines AS (SELECT doc_entry, t.pos, string_split(rep.text, chr(10))[t.pos] AS line FROM rep, LATERAL (SELECT unnest(generate_series(1, len(string_split(rep.text, chr(10))))) AS pos) t), secs AS (SELECT doc_entry, pos, line, last_value(CASE WHEN trim(substr(line, 1, 12)) <> '' THEN trim(substr(line, 1, 12)) END IGNORE NULLS) OVER (PARTITION BY doc_entry ORDER BY pos ROWS UNBOUNDED PRECEDING) AS section, substr(line, 13) AS payload FROM lines) SELECT doc_entry, regexp_split_to_array(split_part(payload, '; ', 1), ' +')[1] AS gene_id, regexp_split_to_array(split_part(payload, '; ', 1), ' +')[2] AS gene_symbol, substr(payload, strpos(payload, '; ') + 2) AS gene_description FROM secs WHERE section = 'GENE' AND contains(payload, '; ') AND len(regexp_split_to_array(split_part(payload, '; ', 1), ' +')) >= 2""")),

    Entry("q_io_uniprot_pfam",
      // uniprot_pfam_map.py:38-54 with the per-accession searchPfam
      // REST round trip replaced by ONE relational join against the
      // (accession, pfam_id) fixture relation: accessions with no hit
      // drop (the reference's try/continue), hits emit the ';'-joined
      // sorted distinct Pfam ids — 10^6 accessions map in one shuffle
      // instead of 10^6 sequential HTTP calls.
      (s, d) => {
        val accs = t(s, d, "supplier")
          .select(concat(lit("A"), col("s_suppkey") % 80).as("acc"))
        val pfam = t(s, d, "part")
          .select(concat(lit("A"), col("p_partkey") % 100).as("pacc"),
            concat(lit("PF"), lpad((col("p_partkey") % 7).cast("string"),
              5, "0")).as("pf"))
        graft.io.UniprotPfam.map(accs, "acc", pfam, "pacc", "pf")
      },
      Some("""WITH accs AS (SELECT DISTINCT 'A' || CAST(s_suppkey % 80 AS VARCHAR) AS uniprot_id FROM supplier), pfam AS (SELECT DISTINCT 'A' || CAST(p_partkey % 100 AS VARCHAR) AS uniprot_id, 'PF' || lpad(CAST(p_partkey % 7 AS VARCHAR), 5, '0') AS pf FROM part) SELECT a.uniprot_id, string_agg(p.pf, ';' ORDER BY p.pf) AS Pfam_id FROM accs a JOIN pfam p ON p.uniprot_id = a.uniprot_id GROUP BY 1""")))
}
