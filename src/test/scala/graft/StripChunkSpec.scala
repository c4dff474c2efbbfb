package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.Sampling
import graft.stats.Sketches

/** Specs for the round-8 corpus-surgery operators: span stripping,
  * keep-first segment dedup, context-window chunking, count-min sketch,
  * and SemDeDup. */
class StripChunkSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "all rights reserved contact us terms of service apply here"

  test("stripRepeatedSpans removes shared boilerplate, keeps unique text") {
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler delta"),
      (2L, s"omega $boiler sigma tau"),
      (3L, "totally unique words nothing shared at all in this one")
    ).toDF("doc_id", "text")
    val out = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 8, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // the 10-token boilerplate is one maximal span in both hosts
    assert(out(1L) == ((14L, 10L, 4L, "alpha beta gamma delta")))
    assert(out(2L) == ((13L, 10L, 3L, "omega sigma tau")))
    // untouched doc passes through verbatim (lowercased tokens rejoined)
    assert(out(3L)._2 == 0L)
    assert(out(3L)._4 == "totally unique words nothing shared at all in this one")
  }

  test("stripRepeatedSpans: doc that is ALL boilerplate -> empty clean_text; " +
       "short docs carry no gram and survive") {
    val docs = Seq(
      (1L, boiler), (2L, boiler),
      (3L, "tiny doc") // < k tokens: no gram, never stripped
    ).toDF("doc_id", "text")
    val out = Dedup.stripRepeatedSpans(docs, "doc_id", "text", k = 8, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((10L, 0L, "")))
    assert(out(2L) == ((10L, 0L, "")))
    assert(out(3L) == ((2L, 2L, "tiny doc")))
  }

  test("tokenWindowSegments: fixed windows with a short tail") {
    val docs = Seq((7L, "a b c d e f g")).toDF("doc_id", "text")
    val segs = Dedup.tokenWindowSegments(docs, "doc_id", "text", segTokens = 3)
      .orderBy("seg_pos").collect().map(r => (r.getInt(1), r.getString(2)))
    assert(segs.toSeq == Seq((0, "a b c"), (1, "d e f"), (2, "g")))
  }

  test("segmentDedupKeepFirst: exactly one copy of a duplicated segment " +
       "survives — the globally first by (id, seg_pos)") {
    val segs = Seq(
      (1L, 0, "shared paragraph"), (1L, 1, "doc one tail"),
      (2L, 0, "doc two head"), (2L, 1, "shared paragraph"),
      (3L, 0, "shared paragraph")
    ).toDF("id", "seg_pos", "segment")
    val out = Dedup.segmentDedupKeepFirst(segs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((2L, 2L, 0L, "shared paragraph doc one tail")))
    assert(out(2L) == ((2L, 1L, 1L, "doc two head")))
    // every segment of doc 3 appeared earlier: present, empty clean_text
    assert(out(3L) == ((1L, 0L, 1L, "")))
  }

  test("segmentDedupKeepFirst: a removed duplicate sharing its seg_pos " +
       "with a kept segment is NOT resurrected into clean_text") {
    // doc 2 has TWO rows at seg_pos 0: "fresh text" (globally first →
    // kept) and "shared paragraph" (dup of doc 1 → removed). The kept
    // set must key on (seg_pos, hash), not position alone.
    val segs = Seq(
      (1L, 0, "shared paragraph"),
      (2L, 0, "fresh text"), (2L, 0, "shared paragraph"),
      (2L, 1, "fresh text") // identical content later in the same doc
    ).toDF("id", "seg_pos", "segment")
    val out = Dedup.segmentDedupKeepFirst(segs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((1L, 1L, 0L, "shared paragraph")))
    // doc 2: 3 segments, kept = "fresh text"@0 only ("shared paragraph"
    // is doc 1's; "fresh text"@1 is a within-doc dup of @0) — and the
    // removed same-position duplicate must not reappear in the text
    assert(out(2L) == ((3L, 1L, 2L, "fresh text")))
  }

  test("chunkWindows: short doc -> one chunk; long doc covers every token " +
       "with stride-spaced starts and a final chunk reaching the end") {
    val docs = Seq(
      (1L, "a b c"),
      (2L, (1 to 11).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Sampling.chunkWindows(docs, "doc_id", "text",
      window = 4, stride = 3)
    val one = out.where(col("id") === 1).collect()
    assert(one.length == 1)
    assert(one(0).getString(4) == "a b c" && one(0).getInt(3) == 3)
    val two = out.where(col("id") === 2).orderBy("chunk_idx")
      .collect().map(r => (r.getInt(2), r.getString(4)))
    // starts 0,3,6,9 — ceil((11-4)/3)=3 extra chunks; last is short
    assert(two.map(_._1).toSeq == Seq(0, 3, 6, 9))
    assert(two.last._2 == "t10 t11")
    // coverage: chunk at start 9 reaches token 11; no chunk starts past it
    val covered = two.flatMap { case (st, txt) =>
      (st until st + txt.split(" ").length) }.toSet
    assert(covered == (0 until 11).toSet)
  }

  test("chunkWindows: stride == window gives disjoint cover (no overlap)") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Sampling.chunkWindows(docs, "doc_id", "text",
      window = 4, stride = 4).orderBy("chunk_idx")
      .collect().map(r => (r.getInt(2), r.getInt(3)))
    assert(chunks.toSeq == Seq((0, 4), (4, 4), (8, 2)))
  }

  test("count-min sketch: est >= true for every token, and merging two " +
       "half-corpus sketches equals the whole-corpus sketch") {
    val toks = Seq.tabulate(500)(i => s"tok${i % 37}").toDF("tok")
    val whole = Sketches.cmsBuild(toks, "tok", depth = 4, width = 64, seed = 7L)
    val truec = toks.groupBy("tok").agg(count(lit(1)).as("true_count"))
    val est = Sketches.cmsEstimate(whole, truec.select("tok"), "tok",
      depth = 4, width = 64, seed = 7L)
    val joined = truec.join(est, "tok").collect()
    assert(joined.length == 37)
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"cms under-estimated ${r.getString(0)}") }
    // mergeability: build on two disjoint deterministic halves (split by
    // token-length parity), merge, compare cell-wise with the whole build
    val ah = Sketches.cmsBuild(toks.where(length(col("tok")) % 2 === 0),
      "tok", 4, 64, 7L)
    val bh = Sketches.cmsBuild(toks.where(length(col("tok")) % 2 === 1),
      "tok", 4, 64, 7L)
    val merged = Sketches.cmsMerge(ah, bh)
    val diff = merged.join(whole.withColumnRenamed("c", "cw"),
        Seq("r", "bucket"), "full")
      .where(coalesce(col("c"), lit(-1L)) =!= coalesce(col("cw"), lit(-1L)))
    assert(diff.count() == 0)
  }

  test("noveltyScore: fully-unique doc scores 1, a full clone pair scores 0") {
    val unique = (1 to 12).map(i => s"only$i").mkString(" ")
    val cloned = (1 to 12).map(i => s"dup$i").mkString(" ")
    val docs = Seq((1L, unique), (2L, cloned), (3L, cloned))
      .toDF("doc_id", "text")
    val out = graft.text.Text.noveltyScore(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0 && out(3L) == 0.0)
  }

  test("bpeMergeStats counts within-token char pairs per occurrence with " +
       "deterministic tie-break") {
    val docs = Seq((1L, "aab aab xy")).toDF("doc_id", "text")
    // pairs: aab -> aa, ab (x2 occurrences); xy -> xy
    val out = graft.text.Text.bpeMergeStats(docs, "text", topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq(("aa", 2L, 1), ("ab", 2L, 2), ("xy", 1L, 3)))
  }

  test("hashEmbed: unit L2 norm, deterministic, equal text -> equal vector") {
    val docs = Seq((1L, "spark rows fast table"), (2L, "spark rows fast table"),
      (3L, "a completely different set of words here"))
      .toDF("doc_id", "text")
    val vecs = graft.text.Text.hashEmbed(docs, "doc_id", "text",
        dim = 16, seed = 11L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs(1L) == vecs(2L))
    assert(vecs(1L) != vecs(3L))
    vecs.values.foreach { v =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4)
      assert(v.length == 16)
    }
  }

  test("hash-embed ANN: an exact text clone is its twin's top neighbor " +
       "at cosine 1") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"), (3L, "iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val emb = graft.text.Text.hashEmbed(docs, "doc_id", "text",
        dim = 32, seed = 11L)
      .select(col("id").as("vec_id"), col("vec").as("embedding"))
    val top = graft.sim.Similarity.bruteForceTopK(emb,
        emb.where(col("vec_id") === 0), "vec_id", "embedding", k = 1)
      .collect()
    assert(top.length == 1)
    assert(top(0).getLong(1) == 1L && top(0).getDouble(3) == 1.0)
  }

  test("corpusDiff classifies added, removed, changed and unchanged ids") {
    val oldS = Seq((1L, "keep me"), (2L, "drop me"), (3L, "mutate me"))
      .toDF("doc_id", "text")
    val newS = Seq((1L, "keep me"), (3L, "mutated!"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val out = Dedup.corpusDiff(oldS, newS, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "removed",
      3L -> "changed", 4L -> "added"))
  }

  test("corpusOverlapKmv: identical corpora estimate 1.0, disjoint 0.0, " +
       "and the estimate tracks the exact Jaccard") {
    def corpus(prefix: String, n: Int) = (1 to n).map(i =>
      (i.toLong, (1 to 9).map(j => s"$prefix${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val a = corpus("x", 40)
    val same = Sketches.corpusOverlapKmv(a, a, "text", shingleK = 5, k = 64)
      .collect()(0)
    assert(same.getDouble(5) == 1.0 && same.getDouble(6) == 1.0)
    val disj = Sketches.corpusOverlapKmv(a, corpus("y", 40), "text",
      shingleK = 5, k = 64).collect()(0)
    assert(disj.getDouble(5) == 0.0 && disj.getDouble(6) == 0.0)
    // half-overlapping corpora: estimate within sampling error of exact
    val b = corpus("x", 20).union(corpus("z", 20)
      .select(col("doc_id") + 100, col("text")))
    val half = Sketches.corpusOverlapKmv(a, b, "text", shingleK = 5, k = 64)
      .collect()(0)
    val (est, exact) = (half.getDouble(5), half.getDouble(6))
    assert(est > 0.0 && est < 1.0)
    assert(math.abs(est - exact) < 0.25,
      s"KMV estimate $est too far from exact $exact")
  }

  test("logistic IRLS learns a separable length signal: long en docs " +
       "score high, short de docs score low") {
    // y = (lang == en); en docs are long (x1 high), de docs short
    // en docs: long with all-distinct tokens; de docs: short and mostly a
    // single repeated token (so BOTH features vary — a constant feature
    // is collinear with the intercept and the system is singular)
    val docs = (1 to 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, (1 to (100 + i)).map(j => s"w${i}_$j").mkString(" "), "en")
      else
        (i.toLong, (Seq.fill(8 + i % 5)("rep") :+ s"tail$i").mkString(" "), "de")
    }.toDF("doc_id", "text", "lang")
    val f = graft.text.QualityModel.features(docs, "doc_id", "text",
      "lang", "en").localCheckpoint(false)
    val path = graft.text.QualityModel.irlsFit(f, iters = 3)
    assert(path.last.b1 > 0, "length coefficient should be positive")
    val scored = graft.text.QualityModel.score(f, path.last)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
    // perfect separation on this data: every prediction matches the label
    scored.foreach { case (y, score, pred) =>
      assert(pred == (y == 1.0), s"misclassified y=$y score=$score")
      assert(pred == (score >= 0.5))
    }
    // and the margin should widen across iterations (IRLS ascends the
    // likelihood): iteration-3 coefficients dominate iteration-1's
    assert(math.abs(path(2).b1) > math.abs(path(0).b1))
  }

  test("semanticDedup prunes a planted near-duplicate within its cluster " +
       "and never prunes across clusters") {
    val base = Array.fill(8)(0.0f)
    def v(i: Int, eps: Float): Array[Float] = {
      val a = base.clone(); a(i) = 1.0f; a((i + 1) % 8) = eps; a
    }
    val rows = Seq(
      (10L, v(0, 0.0f)), (11L, v(0, 0.01f)), // near-dups of each other
      (20L, v(4, 0.0f)), (21L, v(4, 0.02f)), // second clone pair
      (30L, v(2, 0.9f)) // isolated direction
    ).toDF("vec_id", "embedding")
    val out = graft.sim.Clustering.semanticDedup(rows, "vec_id", "embedding",
        threshold = 0.95, k = 3, iters = 2, seed = 1L)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(10L)._1 == false)
    assert(out(11L) == ((true, 10L)))
    assert(out(20L)._1 == false)
    assert(out(21L) == ((true, 20L)))
    assert(out(30L)._1 == false)
  }
}
