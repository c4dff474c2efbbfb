package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{RangeJoin, Relational}

/** Reruns the reference's DOCUMENTED scale limits on this engine.
  *
  * BASELINE.md's only hard numbers about the reference are failure notes:
  *  - `pathMassTransitions.py:206-210`: "Script is consuming too much
  *    memory … masses_df: 2.18 million rows; with a smaller dataset the
  *    script is working fine" — the melt of the quadratic outer-sum matrix
  *    OOMs single-node pandas at 2.18M masses.
  *  - `pathMassTransitions.py:266-268`: the Wisecaver metabolome input is
  *    ~2.8M redundant mass features — the workload the script was FOR.
  *  - `queryMassNPDB_mod.py:26,33-38`: the ppm structure query ships with
  *    a chunk_size=3 memory workaround.
  *
  * This main synthesizes a deterministic 2.8M-feature mass table (uniform
  * 50–1500 Da, hash-derived — no RNG state, no driver-side data) and runs
  * the Spark-first reshapes of both pipelines end-to-end on the same
  * single node the bench uses. The transitions pipeline never builds the
  * quadratic matrix at all (broadcast transition list + rounded-equi
  * join), so 2.8M masses is not a special case — the numbers land in
  * SCALING.md.
  *
  * Usage: runMain graft.ReferenceScaleDemo
  */
object ReferenceScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[refscale] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // deterministic uniform masses in [50, 1500) Da, 4-decimal precision —
    // hash-derived so the table is reproducible and generated distributed
    def massTable(n: Long, seed: Int) =
      spark.range(n).select(col("id").as("mass_id"),
        round(pmod(xxhash64(col("id"), lit(seed)), lit(1000000L)) / 1e6 * 1450 + 50, 4)
          .as("mass"))

    // 1. pathMassTransitions at the Wisecaver scale (2.8M features; the
    //    reference's pandas melt OOMs at 2.18M). Same shape as
    //    q_pipeline_transitions: broadcast transition list, rounded-equi
    //    join back to the mass table — linear, no quadratic matrix.
    val masses = massTable(2800000L, 1)
    val trans = Seq(("t_plus10", 10.0), ("t_plus25_5", 25.5), ("t_minus0_7", -0.7))
      .toDF("transition", "tmass")
    val targets = masses.crossJoin(broadcast(trans))
      .withColumn("target", col("mass") + col("tmass"))
    val partners = masses.select(col("mass_id").as("partner_id"),
      col("mass").as("partner_mass"))
    time("transitions @ 2.8M masses (pandas OOM at 2.18M)") {
      Relational.roundedJoin(targets, partners, "target", "partner_mass", 2)
        .where(col("mass_id") =!= col("partner_id"))
        .select("mass_id", "transition", "partner_id")
        .count()
    }

    // 2. queryMassNPDB ppm structure annotation at the same scale, against
    //    a 100k-structure dimension at the reference's default 30 ppm
    //    (queryMassNPDB.py:22) — the job its chunk_size=3 workaround exists
    //    for. Log-bucketed equi join, no BNLJ, no chunking.
    val structs = massTable(100000L, 2)
      .select(col("mass_id").as("struct_id"), col("mass").as("monoisotopic_mass"))
    time("ppm structure query @ 2.8M x 100k, 30 ppm") {
      RangeJoin.ppmJoin(masses.withColumnRenamed("mass", "mm"), structs,
        "mm", "monoisotopic_mass", 30.0).count()
    }

    spark.stop()
  }
}
