package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.Sampling

/** The full training-data layout pipeline, raw corpus to packed token
  * stream — the composition every pre-training data build runs:
  *
  *   1. curation ([[Curate.curate]]): near-dup clustering keeps one
  *      representative per group, then quality + language gates;
  *   2. deterministic split ([[Sampling.splitAssign]]): keep one named
  *      split (train, by default) by stable hash — re-runs and new data
  *      never migrate existing docs across splits;
  *   3. shuffled packing ([[Sampling.packSequences]] ordered by a second
  *      hash): documents laid out in reproducible shuffled order as one
  *      token stream, each assigned its global start offset and
  *      fixed-budget chunk.
  *
  * One prefix-sum pass does both the shuffle and the packing: packing in
  * hash order IS the shuffled layout, so no separate rank materializes.
  * Scale shape: the dedup tier's banded joins dominate; split is a
  * zero-shuffle filter; the pack is one range exchange + a P-row driver
  * cumsum (see [[Sampling.withRunningOffset]]).
  *
  * @return (doc_id, n_tokens, start_offset, chunk_id), one row per packed
  *         training document
  */
object TrainData {

  def build(docs: DataFrame, idCol: String, textCol: String,
            threshold: Double = 0.8, minQuality: Double = 0.5,
            langs: Seq[String] = Seq("en"),
            cuts: Seq[(String, Double)] =
              Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
            splitName: String = "train", splitSeed: Long = 42L,
            shuffleSeed: Long = 13L, budget: Long = 256L): DataFrame = {
    val curated = Curate.curate(docs, idCol, textCol,
      threshold = threshold, minQuality = minQuality, langs = langs)
    val split = Sampling
      .splitAssign(curated.select(col("doc_id"), col("n_tokens")),
        "doc_id", splitSeed, cuts)
      .where(col("split") === splitName).drop("split")
    Sampling.packSequences(
        split.withColumn("__h", Sampling.hashFrac(col("doc_id"), shuffleSeed)),
        Seq("__h", "doc_id"), "n_tokens", budget)
      .drop("__h")
  }
}
