package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means over an embedding column — corpus
  * clustering for diversity analysis and cluster-balanced sampling (the
  * mixture-shaping step a pre-training pipeline runs between dedup and
  * split: cap or re-weight over-represented semantic clusters the way
  * `Sampling.domainQuota` caps over-represented domains).
  *
  * Built for CROSS-ENGINE replayability, the same discipline as the
  * ComBat/hclust kernels: input vectors are quantized once onto the 1e-6
  * grid, centroid updates are EXACT decimal sums divided by exact counts
  * (order-independent ⇒ bit-identical in any engine), and per-iteration
  * distances are fixed-order left folds over the dimension axis — so a
  * DuckDB oracle unrolls the whole fit term for term and the gate
  * hash-compares assignments, not just counts. Ties in the argmin break
  * on the smaller cluster id; initial centroids are the k vectors with
  * the smallest md5(seed:id), numbered in that hash order.
  *
  * Scale shape: each iteration is one zero-shuffle assignment pass (the
  * k×dim centroid table is a PLAN-TIME literal — no join, no broadcast
  * exchange, whole-stage codegen) plus one per-(cluster, dim) aggregate
  * (map-side partial combine; k·dim tiny output). Driver state is the
  * k×dim centroid matrix — never row data. The vectors frame is
  * localCheckpointed once and re-read per iteration. */
object Clustering {

  /** @return (id, cluster, dist) — squared-euclidean distance to the
    *         winning centroid after exactly `iters` assignment/update
    *         rounds, rounded to 6 decimals. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, iters: Int = 4, seed: Long = 42L): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be positive")
    val grid = (c: Column) =>
      floor(c.cast("double") * lit(1e6) + lit(0.5)) / lit(1e6)
    val vecs = df.select(col(idCol).as("id"),
        transform(col(vecCol), x => grid(x)).as("v"))
      .localCheckpoint(false)
    // deterministic init: k smallest md5(seed:id), cluster = hash rank
    var centroids: Array[Array[Double]] = vecs
      .select(col("id"), col("v"),
        md5(concat(lit(s"km$seed:"), col("id").cast("string"))).as("h"))
      .orderBy(col("h"), col("id")).limit(k)
      .select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    require(centroids.length == k,
      s"kmeansAssign: need at least k=$k input rows")

    def assignCols(cs: Array[Array[Double]]): Column = array_min(array(
      cs.zipWithIndex.map { case (cv, j) =>
        struct(
          aggregate(zip_with(col("v"), lit(cv), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, d) => acc + d).as("d"),
          lit(j).as("c"))
      }: _*))

    var i = 0
    while (i < iters) {
      val assigned = vecs.withColumn("__m", assignCols(centroids))
        .select(col("id"), col("v"), col("__m").getField("c").as("cluster"))
      // exact per-(cluster, dim) mean: grid values cast to DECIMAL are
      // exact, the decimal sum is order-independent, and sum/count is one
      // IEEE division of identical operands in any engine
      val updated = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg((sum(col("x").cast("decimal(24,6)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("cluster")
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cluster"),
          transform(col("dm"), e => e.getField("m")).as("cv"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // an empty cluster keeps its previous centroid
      centroids = Array.tabulate(k)(j => updated.getOrElse(j, centroids(j)))
      i += 1
    }
    vecs.withColumn("__m", assignCols(centroids))
      .select(col("id"), col("__m").getField("c").as("cluster"),
        round(col("__m").getField("d"), 6).as("dist"))
  }

  /** Cluster occupancy profile: size and share per cluster — the input
    * to a rebalancing policy (compose with `Sampling.domainQuota` on the
    * cluster label to cap over-represented clusters). */
  def clusterProfile(assignments: DataFrame): DataFrame = {
    val total = assignments.count().toDouble
    assignments.groupBy("cluster")
      .agg(count(lit(1)).as("size"))
      .withColumn("share", round(col("size") / lit(total), 6))
  }
}
