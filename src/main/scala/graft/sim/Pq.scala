package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory side of production-scale ANN
  * (IVF-PQ à la FAISS/Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): each vector is split into `m` subspaces,
  * each subspace learns a `ksub`-centroid codebook, and a corpus row is
  * stored as m small integer codes (m bytes at ksub ≤ 256) instead of
  * dim floats — a 64-dim float32 embedding compresses 32× at m=8. Query
  * scoring is ADC (asymmetric distance computation): the query computes
  * one dot-product table per subspace against the codebook ONCE, then
  * every corpus row scores as m table lookups + adds — no float vector
  * is ever touched at scan time.
  *
  * Cross-engine exactness discipline (same as [[Clustering]]): inputs
  * quantize to the 1e-6 grid, the per-subspace codebooks are the
  * exact-replay [[Clustering.lloydFit]] (decimal sums / exact counts,
  * md5-rank init, fixed iterations, seed + s per subspace), and every
  * float reduction is a fixed-order left fold — so the DuckDB oracle
  * replays codebook fit, encoding, and ADC scoring term for term and
  * the gate hash-compares the full top-k, not just recall.
  *
  * Scale shape: the codebook fit is iters+1 passes of zero-shuffle
  * assignment plus a (ksub·dim)-row aggregate per subspace (driver holds
  * only the m·ksub·(dim/m) centroid matrix); encoding is ONE zero-
  * shuffle projection over the corpus (plan-time centroid literals,
  * whole-stage codegen); scoring is a broadcast of the query table —
  * each query carrying its m ADC arrays — against the streamed CODE
  * table (the corpus reads m ints per row, not dim floats), then a
  * per-query top-k window. At 100 TB the code table is the thing you
  * persist: 100× smaller than the embeddings, re-scored without ever
  * re-reading them. Compose with the IVF cell routing
  * ([[Similarity.ivfTopK]]) to prune the scan *and* shrink the bytes.
  */
object Pq {

  /** Fit per-subspace codebooks, encode the corpus, ADC-score the query
    * set, return exact top-k per query BY THE PQ APPROXIMATE SCORE.
    *
    * @return (query_id, neighbor_id, rank, adc_cos) — adc_cos is the
    *         approximate cosine dot(q, x̂)/(‖q‖·‖x̂‖) with x̂ the PQ
    *         reconstruction, rounded 6. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 4, ksub: Int = 8,
             iters: Int = 2, seed: Long = 42L): DataFrame = {
    require(m >= 1 && ksub >= 2 && iters >= 1, "bad PQ parameters")
    val corpusV = corpus.select(col(idCol).as("neighbor_id"),
        transform(col(vecCol), x => Clustering.grid(x)).as("v"))
      .localCheckpoint(false) // feeds m codebook fits + the encode pass
    val dim = corpusV.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val d = dim / m
    def sub(v: org.apache.spark.sql.Column, s: Int) =
      slice(v, s * d + 1, d)
    // the m fits are independent chains of tiny jobs (init collect +
    // iters update collects each); run them concurrently so the
    // operator's wall clock is one fit's job-launch latency, not m of
    // them — Spark's scheduler interleaves the stages across the cluster
    val codebooks: IndexedSeq[Array[Array[Double]]] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence((0 until m).map { s =>
        Future(Clustering.lloydFit(
          corpusV.select(col("neighbor_id").as("id"),
            sub(col("v"), s).as("v")),
          ksub, iters, seed + s))
      }), Duration.Inf)
    }
    // ‖centroid‖² per (subspace, code): left fold over dims, the same
    // order the oracle's list_reduce uses, so ‖x̂‖ replays exactly
    val cnorm2: IndexedSeq[Array[Double]] =
      codebooks.map(_.map(_.foldLeft(0.0)((a, x) => a + x * x)))
    // encode: m plan-time-literal argmins, one zero-shuffle pass
    val encoded = (0 until m).foldLeft(corpusV) { (df, s) =>
      df.withColumn(s"__c$s",
        Clustering.assignCols(sub(col("v"), s), codebooks(s)).getField("c"))
    }.drop("v")
    // query side: the ADC dot table per subspace (ksub entries), plus ‖q‖
    val qPrep = (0 until m).foldLeft(
      queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), x => Clustering.grid(x)).as("qv"))) {
      (df, s) =>
        df.withColumn(s"__t$s", array(codebooks(s).map(cv =>
          aggregate(zip_with(sub(col("qv"), s), lit(cv), (x, y) => x * y),
            lit(0.0), (acc, p) => acc + p)): _*))
    }.withColumn("__qn",
      sqrt(aggregate(col("qv"), lit(0.0), (acc, x) => acc + x * x)))
      .drop("qv")
    // score every code row per query: m lookups + adds (broadcast query
    // table vs streamed codes — the PQ scan; IVF routing would prune it)
    val adot = (0 until m).map(s =>
        element_at(col(s"__t$s"), col(s"__c$s") + 1))
      .reduceLeft(_ + _)
    val xn2 = (0 until m).map(s =>
        element_at(lit(cnorm2(s)), col(s"__c$s") + 1))
      .reduceLeft(_ + _)
    val scored = encoded.crossJoin(broadcast(qPrep))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("__ac", adot / (col("__qn") * sqrt(xn2)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__ac").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__ac"), 6).as("adc_cos"))
  }
}
