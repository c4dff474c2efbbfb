package graft.omics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DriverNet: driver-gene discovery as greedy weighted set cover over a
  * bipartite mutation → expression-outlier event graph.
  *
  * Reference semantics: DriverNet/ComputeDrivers.R:10-46,
  * DriverSelection.R:1-161 (greedy loop: count events covered per mutated
  * gene, pick argmax, delete covered events, repeat),
  * Graph.R:6-44 (bipartite event construction),
  * SignificanceTest.R:28-74 + ResultSummary.R:104-129 (permutation null).
  *
  * Spark-first shape: the event graph is three equi-joins (never
  * materialized as the reference's dense patient×gene matrices); each
  * greedy iteration is one aggregate + a 1-row argmax collect + an
  * anti-join delete, with localCheckpoint to cut lineage. The loop count is
  * the number of reported drivers (small, user-bounded) — the data-sized
  * work stays distributed.
  */
object DriverNet {

  /** Build the coverage relation: (driver_gene, patient, outlier_gene)
    * — gene g covers event (patient p, outlier gene h) iff p carries a
    * mutation in g, g influences h, and h is an expression outlier in p. */
  def coverage(mutations: DataFrame, outliers: DataFrame, influence: DataFrame,
               patCol: String = "patient", geneCol: String = "gene",
               srcCol: String = "gene_a", dstCol: String = "gene_b"): DataFrame = {
    val mut = mutations.select(col(patCol).as("patient"), col(geneCol).as("driver_gene"))
    val out = outliers.select(col(patCol).as("patient"), col(geneCol).as("outlier_gene"))
    val inf = influence.select(col(srcCol).as("driver_gene"), col(dstCol).as("outlier_gene"))
    mut.join(inf, "driver_gene")
      .join(out, Seq("patient", "outlier_gene"))
      .select("driver_gene", "patient", "outlier_gene")
      .distinct()
  }

  /** Greedy driver selection. Returns (rank, driver_gene, events_covered)
    * with deterministic ties (max count, then lexicographic gene).
    * Mirrors .greedyGeneDriverSelection (DriverSelection.R:36-86) +
    * .deleteMutatedGene (:133-161). */
  def greedyDrivers(cov: DataFrame, maxDrivers: Int = 10): DataFrame = {
    val spark = cov.sparkSession
    import spark.implicits._
    var remaining = cov.localCheckpoint()
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var rank = 1
    var done = false
    while (rank <= maxDrivers && !done) {
      val top = remaining.groupBy("driver_gene").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("driver_gene"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val gene = top(0).getString(0)
        val n = top(0).getLong(1)
        picked += ((rank, gene, n))
        val covered = remaining.where(col("driver_gene") === gene)
          .select("patient", "outlier_gene")
        remaining = remaining.join(covered, Seq("patient", "outlier_gene"), "left_anti")
          .localCheckpoint()
        rank += 1
      }
    }
    picked.toSeq.toDF("rank", "driver_gene", "events_covered")
  }

  /** Per-driver permutation p-values (ResultSummary.R:104-129: the
    * fraction of randomized runs whose best cover meets or beats the
    * observed cover, with the standard +1 correction so p is never 0). */
  def significance(drivers: DataFrame, nullTops: DataFrame): DataFrame = {
    val n = broadcast(nullTops.agg(count(lit(1)).as("__nperm")))
    drivers.join(broadcast(nullTops), col("top_cover") >= col("events_covered"),
        "left")
      .groupBy("rank", "driver_gene", "events_covered")
      .agg(count(col("top_cover")).as("__ge"))
      .crossJoin(n)
      .withColumn("p_value",
        round((col("__ge") + 1).cast("double") / (col("__nperm") + 1), 6))
      .drop("__ge", "__nperm")
  }

  /** Permutation significance: N seeded random relabelings of the mutation
    * gene column (SignificanceTest.R:28-74); the null statistic is the top
    * greedy cover size; p(driver) = fraction of null tops >= observed
    * (ResultSummary.R:104-129). The relabeling is an md5-derived permutation
    * so runs are reproducible (SURVEY §7.4 nondeterminism note). */
  def permutedTopCovers(mutations: DataFrame, outliers: DataFrame,
                        influence: DataFrame, nPerm: Int, seed: Long = 42L,
                        patCol: String = "patient", geneCol: String = "gene"): DataFrame = {
    val spark = mutations.sparkSession
    import spark.implicits._
    val tops = (0 until nPerm).map { i =>
      val key = md5(concat(lit(s"perm$seed:$i:"), col(patCol).cast("string"),
        lit(":"), col(geneCol).cast("string")))
      // permute genes among mutation rows: pair slot-indexed genes with
      // slot-indexed patient rows under two different deterministic total
      // orders. withRowIndex = distributed sort + zipWithIndex (a bare
      // global row_number window would single-partition the table).
      val genes = graft.ops.Relational.withRowIndex(
        mutations.select(col(geneCol).as("gene"),
          key.as("__k"), col(patCol).as("__p")),
        Seq(col("__k"), col("__p"), col("gene")), "slot").select("gene", "slot")
      val rows = graft.ops.Relational.withRowIndex(
        mutations.select(col(patCol).as("patient"), col(geneCol).as("__g")),
        Seq(col("patient"), col("__g")), "slot").select("patient", "slot")
      val permMut = rows.join(genes, "slot").select("patient", "gene")
      val cov = coverage(permMut, outliers, influence)
      val top = cov.groupBy("driver_gene").agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).collect()(0)
      (i, if (top.isNullAt(0)) 0L else top.getLong(0))
    }
    tops.toDF("perm", "top_cover")
  }
}
