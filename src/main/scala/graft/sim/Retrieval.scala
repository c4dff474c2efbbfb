package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independently-ranked candidate lists
  * (lexical BM25, embedding cosine, ...) with Reciprocal Rank Fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009 — public method):
  * `rrf(d) = Σ_lists 1 / (c + rank_list(d))`, missing-from-a-list
  * contributing 0. RRF needs only RANKS, never score calibration
  * across retrievers, which is exactly why it is the standard fusion
  * for mixing a lexical and a semantic retriever — the corpus-mining
  * step a training-data pipeline runs to pull topical documents with
  * both surface-form and semantic matches.
  *
  * Scale shape: each input list is a top-N HEAD (TakeOrdered on the
  * retriever side — never a corpus-wide global sort); the fusion is a
  * full outer join of dim-sized heads plus a rank over the ≤k fused
  * head. At 100 TB the cost is the retrievers (BM25 = one tf shuffle
  * + broadcast idf; ANN = the indexed path), not the fusion.
  *
  * Determinism contract for the oracle: ranks are exact integers, each
  * RRF term is one IEEE division `1.0 / (c + rank)`, and the per-doc
  * sum folds in FIXED list order — DuckDB replays the arithmetic
  * bit-for-bit, ties break by id on both sides. */
object Retrieval {

  /** Fuse named ranked lists, each `(id, rank)` with distinct ids and
    * 1-based integer ranks. Returns the fused top-k:
    * `(id, fused_rank, rrf_score, rank_<name>...)` with per-list ranks
    * NULL where a document is absent from that list.
    *
    * The fused-rank window is unpartitioned BY DESIGN over the ≤k-row
    * TakeOrdered head — the bounded-global-window pattern (PlanAudit
    * whitelist), not a corpus sort. */
  def rrfFuse(lists: Seq[(String, DataFrame)], c: Int = 60,
              k: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no input lists")
    val renamed = lists.map { case (name, df) =>
      name -> df.select(col("id"), col("rank").cast("int")
        .as(s"rank_$name"))
    }
    val joined = renamed.map(_._2)
      .reduce((a, b) => a.join(b, Seq("id"), "full"))
    // fixed fold order over ≤|lists| doubles per row: deterministic sum
    val rrf: Column = renamed.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(c.toDouble) + col(s"rank_$name")), lit(0.0))
    }.reduce(_ + _)
    val head = joined.withColumn("__rrf", rrf)
      .orderBy(col("__rrf").desc, col("id"))
      .limit(k)
    head
      .withColumn("fused_rank", row_number()
        .over(Window.orderBy(col("__rrf").desc, col("id"))))
      .select(Seq(col("id"), col("fused_rank"),
        round(col("__rrf"), 6).as("rrf_score")) ++
        renamed.map { case (name, _) => col(s"rank_$name") }: _*)
  }

  /** The composed hybrid corpus-mining query: BM25 over a seed term bag
    * (top-N lexical head) fused with exact cosine against one query
    * embedding (top-N semantic head; [[Similarity.bruteForceTopK]] is
    * the declared exactness baseline — swap [[Similarity.lshTopK]] /
    * IVF in for the indexed 100 TB path, the fusion is agnostic to it).
    * `docs.idCol` and `emb.vecIdCol` share an id space (the embedding
    * of document i carries vec id i). */
  def hybridTopK(docs: DataFrame, emb: DataFrame, docIdCol: String,
                 textCol: String, vecIdCol: String, vecCol: String,
                 terms: Seq[String], queryVecId: Long, topN: Int = 50,
                 c: Int = 60, k: Int = 20): DataFrame = {
    val lex = graft.text.Text.bm25TopK(docs, docIdCol, textCol, terms,
        topK = topN)
      // rank over the ≤topN TakeOrdered head (bounded global window)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score_units").desc, col("id"))))
      .select("id", "rank")
    val sem = Similarity.bruteForceTopK(emb,
        emb.where(col(vecIdCol) === queryVecId), vecIdCol, vecCol,
        k = topN)
      .select(col("neighbor_id").as("id"), col("rank"))
    rrfFuse(Seq("lex" -> lex, "sem" -> sem), c, k)
      .withColumnRenamed("id", "doc_id")
  }

  /** The INDEXED-head hybrid composition — what a 100 TB corpus-mining
    * run actually executes: the semantic head is
    * [[Similarity.ivfExactTopK]] (replayable coarse quantizer, genuinely
    * partial probe — nProbe of nCells cells, recall < 1 by construction)
    * instead of [[hybridTopK]]'s brute-force exactness baseline. The
    * fusion is identical ([[rrfFuse]] is head-agnostic); what this
    * composition pins is that the fused ranking over the ROUTED
    * candidate set — quantizer fit, cell probe, exact rescore, RRF —
    * replays end to end. */
  def hybridTopKIvf(docs: DataFrame, emb: DataFrame, docIdCol: String,
                    textCol: String, vecIdCol: String, vecCol: String,
                    terms: Seq[String], queryVecId: Long, nCells: Int = 8,
                    nProbe: Int = 2, iters: Int = 2, seed: Long = 42L,
                    topN: Int = 50, c: Int = 60, k: Int = 20): DataFrame = {
    val lex = graft.text.Text.bm25TopK(docs, docIdCol, textCol, terms,
        topK = topN)
      // rank over the ≤topN TakeOrdered head (bounded global window)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("score_units").desc, col("id"))))
      .select("id", "rank")
    val sem = Similarity.ivfExactTopK(emb,
        emb.where(col(vecIdCol) === queryVecId), vecIdCol, vecCol,
        k = topN, nCells = nCells, nProbe = nProbe, iters = iters,
        seed = seed)
      .select(col("neighbor_id").as("id"), col("rank"))
    rrfFuse(Seq("lex" -> lex, "ivf" -> sem), c, k)
      .withColumnRenamed("id", "doc_id")
  }
}
