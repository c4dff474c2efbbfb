package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.Text

/** End-to-end corpus curation — the composition a training-data pipeline
  * actually runs over raw documents (driver-brief extension; each stage is
  * an already-oracle-verified operator):
  *
  *   1. near-duplicate clustering: MinHash-LSH candidate pairs
  *      ([[Dedup.minhashLshPairs]], exact-Jaccard verified) → connected
  *      components → one representative per duplicate group
  *      ([[Dedup.clusterDocuments]], min-id representative);
  *   2. quality scoring ([[Text.qualityScore]]: length/punctuation/
  *      stopword/uniqueness mix);
  *   3. language identification ([[Text.langId]], stopword-hit heuristic);
  *   4. the curation gate: keep representatives with quality >= cut whose
  *      predicted language is in the accept list.
  *
  * Scale shape: inherits its stages' shapes — banding equi-joins and
  * pair-key exchanges from the dedup tier (never all-pairs). Quality and
  * language are zero-shuffle column pipelines CHAINED over one projection
  * of the corpus (one scan computes both), so the whole gate costs the
  * dedup tier plus a single doc_id equi-join of cluster labels against
  * metrics. Dropping a whole cluster whose representative fails the gate
  * is intentional: the representative IS the cluster's surviving text.
  *
  * @return (doc_id, cluster_id, cluster_size, n_tokens, quality,
  *         pred_lang) — one row per SURVIVING document
  */
object Curate {

  def curate(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 3, threshold: Double = 0.8,
             numHashes: Int = 128, bands: Int = 16,
             minQuality: Double = 0.5,
             langs: Seq[String] = Seq("en")): DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs, idCol, textCol,
      k = k, threshold = threshold, numHashes = numHashes, bands = bands)
    val clustered = Dedup.clusterDocuments(docs, idCol, pairs)
      .where(col("kept"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    // quality + language chained on ONE projection: both are zero-shuffle
    // withColumn pipelines, so a single corpus scan computes all metrics
    // and only one doc_id join remains. spread() first: the chained
    // quality+langId token kernels are ~100 µs/doc — 5× the shingle
    // kernel's measured not-worth-spreading cost — and an unsplittable
    // input otherwise serializes them on one core (no-op at real scale,
    // same contract as the minhash signature kernel).
    val metrics = Text.langId(Text.qualityScore(
        graft.ops.Relational.spread(
          docs.select(col(idCol).as("doc_id"), col(textCol))), textCol),
        textCol)
      .select(col("doc_id"), col("n_tokens"), col("quality"), col("pred_lang"))
    clustered
      .join(metrics, "doc_id")
      .where(col("quality") >= minQuality && col("pred_lang").isin(langs: _*))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("n_tokens"), col("quality"), col("pred_lang"))
  }

  /** Leak-free split assignment — the FIX for what the split-leakage
    * audit detects: hashing doc ids sends near-duplicate copies to
    * different splits (test questions leak into training through
    * clones the hash cannot see), so the split key must be the
    * DUPLICATE-CLUSTER id: whole clusters land in one split, by the
    * same deterministic md5-threshold assignment `splitAssign` uses.
    *
    * Scale shape: the pair tier + connected components (both already
    * bounded), then a zero-shuffle hash projection — assignment adds
    * nothing to the dedup cost.
    *
    * @return (doc_id, cluster_id, split) for every doc */
  def leakFreeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                    seed: Long, cuts: Seq[(String, Double)]): DataFrame =
    graft.text.Sampling.splitAssign(
      Dedup.clusterDocuments(docs, idCol, pairs)
        .select(col("doc_id"), col("cluster_id")),
      "cluster_id", seed, cuts)

  /** Incremental quality maintenance between corpus snapshots — the
    * refresh pattern every derived table needs at 100 TB: diff the
    * snapshots by content hash ([[Dedup.corpusDiff]]), RE-SCORE only
    * added + changed docs, CARRY FORWARD the persisted scores of
    * unchanged ones, drop removed ones. The merge provably equals a
    * full recompute over the new snapshot (unchanged text ⇒ unchanged
    * score — the gate states exactly that equality), at the cost of
    * scoring only the delta.
    *
    * Scale shape: the diff is one id equi-join of content hashes; the
    * scoring projection runs over the delta only; the carried side is a
    * broadcast-or-shuffle id join of the EXISTING score table. Nothing
    * rescans unchanged text.
    *
    * @param oldScores the persisted (idCol, quality) table from the
    *                  previous run
    * @return (doc_id, quality, refreshed) for every doc of the NEW
    *         snapshot */
  def qualityIncremental(oldScores: DataFrame, oldDocs: DataFrame,
                         newDocs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val diff = Dedup.corpusDiff(oldDocs, newDocs, idCol, textCol)
      .select(col("id").as(idCol), col("status"))
    val fresh = Text.qualityScore(
        newDocs.join(diff.where(col("status").isin("added", "changed"))
          .select(col(idCol)), idCol),
        textCol)
      .select(col(idCol), col("quality"), lit(true).as("refreshed"))
    val carried = oldScores.select(col(idCol), col("quality"))
      .join(diff.where(col("status") === "unchanged").select(col(idCol)),
        idCol)
      .select(col(idCol), col("quality"), lit(false).as("refreshed"))
    fresh.unionByName(carried)
  }
}
