package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KEGG flat-file ingestion — the PARSE half of the reference's REST
  * scans (kegg.py:6-48). The fetch itself (`REST.kegg_get` /
  * `REST.kegg_list`) is out of engine scope by the SURVEY §2.1 contract
  * (zero-egress; responses arrive as static fixture tables), exactly
  * like the multimodal decode boundary; what the reference COMPUTES on
  * the fetched text is implemented here, Spark-first:
  *
  *  - `kegg_list` responses are 2-column TSV (`entry\tdescription`,
  *    kegg.py:14-24) — [[pathwayList]] parses them relationally;
  *  - `kegg_get` responses are the KEGG flat format: section names live
  *    in the first 12 columns, blank-prefixed lines CONTINUE the
  *    current section (kegg.py:33-38) — [[sectionLines]] re-expresses
  *    the reference's sequential current_section loop as a per-document
  *    fill-forward window (partitioned by entry, ordered by line
  *    position — each flat record is KB-sized by format contract, so
  *    the window is bounded and never corpus-wide);
  *  - the GENE-section payload `gene_id  SYMBOL; description`
  *    (kegg.py:40-44) is split relationally in [[geneSection]].
  *
  * NOT a port: the reference iterates line-by-line per pathway in
  * Python; here every pathway document parses in parallel and the
  * "which section am I in" state is a window fill-forward, so 10⁶
  * documents parse exactly like 10. */
object Kegg {

  /** Parse a `kegg_list`-shaped TSV response relation
    * (id, raw `entry\tdescription` line) into (entry, description). */
  def pathwayList(df: DataFrame, lineCol: String): DataFrame =
    df.select(split(col(lineCol), "\t").as("__p"))
      .where(size(col("__p")) >= 2)
      .select(col("__p").getItem(0).as("entry"),
        col("__p").getItem(1).as("description"))

  /** Explode flat-format documents into (entry, pos, section, payload)
    * rows: section = the fill-forward of the 12-column header field,
    * payload = the line body after column 12. */
  def sectionLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "line")))
      // the 12-column section header; blank prefix = continuation
      .withColumn("__sec",
        when(trim(substring(col("line"), 1, 12)) =!= "",
          trim(substring(col("line"), 1, 12))))
      .withColumn("section", last(col("__sec"), ignoreNulls = true).over(w))
      .withColumn("payload", col("line").substr(lit(13), length(col("line"))))
      .drop("__sec", "line")
  }

  /** The GENE-section extraction of kegg.py:40-44 over flat-format
    * documents: one row per gene line,
    * (entry, gene_id, gene_symbol, gene_description).
    *
    * Separator contract: the reference's strict 2-tuple unpack
    * (`line[12:].split("; ")`, kegg.py:41) CRASHES on a payload with
    * more than one `"; "`; this engine extends it totally by treating
    * the FIRST `"; "` as the ids/description boundary — gene_description
    * is everything after the first separator (so a description may
    * itself contain `"; "`). The q_io_kegg DuckDB oracle pins the same
    * semantic (`substr(payload, strpos(payload, '; ') + 2)`), and the
    * IoMultimodalSpec property test exercises multi-`"; "` payloads. */
  def geneSection(df: DataFrame, idCol: String, textCol: String): DataFrame =
    sectionLines(df, idCol, textCol)
      .where(col("section") === "GENE" && col("payload").contains("; "))
      .withColumn("__idsym",
        split(substring_index(col("payload"), "; ", 1), " +"))
      .where(size(col("__idsym")) >= 2)
      .select(col(idCol),
        col("__idsym").getItem(0).as("gene_id"),
        col("__idsym").getItem(1).as("gene_symbol"),
        col("payload").substr(instr(col("payload"), "; ") + lit(2),
          length(col("payload"))).as("gene_description"))
}

/** The UniProt→Pfam accession mapping of uniprot_pfam_map.py:38-54:
  * per accession, the ';'-joined set of Pfam ids, accessions with no
  * hit dropped (the reference's try/continue). The per-accession
  * `searchPfam` REST round-trip becomes one relational join against
  * the (accession, pfam_id) fixture relation — 10⁶ accessions map in
  * one shuffle instead of 10⁶ sequential HTTP calls. */
object UniprotPfam {
  /** @return (uniprot_id, Pfam_id) with Pfam_id = ';'-joined SORTED
    *         distinct ids (the reference joins dict-key order, which
    *         its own data happens to keep sorted; sorting pins
    *         determinism for the gate). */
  def map(accessions: DataFrame, accCol: String,
          pfam: DataFrame, pfamAccCol: String, pfamIdCol: String): DataFrame =
    accessions.select(col(accCol).as("uniprot_id")).distinct()
      .join(pfam.select(col(pfamAccCol).as("uniprot_id"),
        col(pfamIdCol).as("__pf")), Seq("uniprot_id"))
      .groupBy("uniprot_id")
      .agg(array_join(sort_array(collect_set(col("__pf"))), ";")
        .as("Pfam_id"))
}
