package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Clustering

/** Adversarial coverage for the round-9 rework: the positional gram-hash
  * kernel behind the substring-dedup tier, the grouped Lloyd fit behind
  * the PQ codebooks, and the content-equality/caching contract of
  * BloomContainsExpr. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // ---- tokenGramHashesKernel ------------------------------------------

  private def literalGramHashes(text: String, k: Int): Array[Long] = {
    // independent reference: tokenize, build each literal gram, md5 it
    // through the JDK directly (not the kernel's digest path)
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) return Array.emptyLongArray
    (0 to toks.length - k).map { i =>
      val gram = toks.slice(i, i + k).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(gram.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }.toArray
  }

  test("tokenGramHashesKernel == per-gram md5 reference, incl. edges") {
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and   irregular \t whitespace  here now ok",
      "UPPER Case MiXeD tokens SHOULD lowercase first ok",
      "exactly four tokens here",      // == k
      "only three tokens",             // < k -> empty
      "", "   ",                       // no tokens -> empty
      "a b c d e f g h i j k l m n")
    for (t <- cases) {
      val got = Dedup.tokenGramHashesKernel(t, 4)
      val want = literalGramHashes(t, 4)
      assert(got.toSeq == want.toSeq, s"mismatch for <$t>")
    }
    assert(Dedup.tokenGramHashesKernel(null, 4).isEmpty)
  }

  test("repeated spans and token profile are invariant to text CASE " +
    "(kernel lowercases like the oracle)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, base), (2L, base.toUpperCase),
      (3L, "unrelated words entirely distinct from the shared paragraph ok"))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(docs, "doc_id", "text", k = 4, minDf = 2)
      .orderBy("id").collect()
    // both casings of the shared text produce one full-cover span each
    assert(spans.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(spans.forall(r => r.getInt(1) == 0 && r.getInt(2) == 10))
  }

  test("gram-hash keyspace: gramDfIndex joins repeatedSpansIncremental " +
    "across separately-built sides") {
    val shared = "one two three four five six seven eight nine ten"
    val corpus = Seq((10L, shared),
      (11L, "totally different corpus document with other words here")).toDF("doc_id", "text")
    val batch = Seq((300L, s"prefix words then $shared trailing bits"))
      .toDF("doc_id", "text")
    val idx = Dedup.gramDfIndex(corpus, "doc_id", "text", k = 4)
    val spans = Dedup.repeatedSpansIncremental(batch, idx,
      "doc_id", "text", k = 4, minDf = 2).collect()
    // the batch doc shares the 10-token paragraph with ONE corpus doc:
    // neither side alone reaches minDf, the summed df does
    assert(spans.length == 1)
    val r = spans.head
    assert(r.getInt(1) == 3 && r.getInt(2) == 13) // tokens 3..12 covered
  }

  // ---- lloydFitMulti ---------------------------------------------------

  test("lloydFitMulti is bit-identical to m independent lloydFit runs") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val vecs = emb.select(col("vec_id").as("id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5d) / 1e6 AS DOUBLE))").as("v"))
    val d = 16
    val m = 4
    val seedBase = 91L
    val exploded = vecs.select(col("id"),
        posexplode(array((0 until m).map(s =>
          slice(col("v"), s * d + 1, d)): _*)))
      .toDF("id", "g", "v")
    val multi = Clustering.lloydFitMulti(exploded, k = 5, iters = 2,
      (0 until m).map(seedBase + _))
    (0 until m).foreach { s =>
      val single = Clustering.lloydFit(
        vecs.select(col("id"), slice(col("v"), s * d + 1, d).as("v")),
        k = 5, iters = 2, seedBase + s)
      assert(multi(s).length == single.length)
      multi(s).zip(single).zipWithIndex.foreach { case ((a, b), j) =>
        assert(a.toSeq == b.toSeq,
          s"subspace $s centroid $j differs from the sequential fit")
      }
    }
  }

  test("lloydFitMulti supports mixed vector widths across groups") {
    val vecs = Seq(
      (0, 1L, Seq(0.0, 0.0)), (0, 2L, Seq(1.0, 1.0)), (0, 3L, Seq(9.0, 9.0)),
      (1, 1L, Seq(0.0, 0.0, 0.0)), (1, 2L, Seq(5.0, 5.0, 5.0)),
      (1, 3L, Seq(5.2, 5.0, 5.0))).toDF("g", "id", "v")
    val fits = Clustering.lloydFitMulti(vecs, k = 2, iters = 2, IndexedSeq(7L, 8L))
    assert(fits(0).forall(_.length == 2) && fits(1).forall(_.length == 3))
  }

  test("lloydFitMulti rejects a group with fewer than k rows") {
    val vecs = Seq((0, 1L, Seq(0.0)), (0, 2L, Seq(1.0)),
      (1, 1L, Seq(0.0))).toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException] {
      Clustering.lloydFitMulti(vecs, k = 2, iters = 1, IndexedSeq(7L, 8L))
    }
    assert(e.getMessage.contains("group 1"))
  }

  // ---- BloomContainsExpr content equality ------------------------------

  test("BloomContainsExpr compares by bitmap content, not reference") {
    import org.apache.spark.util.sketch.BloomFilter
    def bytesOf(keys: Seq[Long]): Array[Byte] = {
      val bf = BloomFilter.create(1000, 0.01)
      keys.foreach(bf.putLong)
      val baos = new java.io.ByteArrayOutputStream()
      bf.writeTo(baos)
      baos.toByteArray
    }
    val child = org.apache.spark.sql.catalyst.expressions.Literal(1L)
    val a = graft.catalyst.BloomContainsExpr(child, bytesOf(Seq(1L, 2L)))
    val b = graft.catalyst.BloomContainsExpr(child,
      bytesOf(Seq(1L, 2L)).clone())
    val c = graft.catalyst.BloomContainsExpr(child, bytesOf(Seq(3L)))
    assert(a == b && a.hashCode == b.hashCode) // equal content, new array
    assert(a != c)
    assert(a.semanticEquals(b) && !a.semanticEquals(c))
    // the per-executor cache hands BOTH equal expressions one filter
    assert(a.test(1L) && b.test(1L) && !c.test(1L))
  }

  // ---- duplicateClustersIncremental ------------------------------------

  test("duplicateClustersIncremental: a new pair BRIDGES two old " +
    "components and the result equals the full recompute") {
    import spark.implicits._
    val oldPairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val oldAssign = Dedup.duplicateClusters(oldPairs)
    assert(oldAssign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // (2,3) bridges the two old components; (5,6) is a brand-new one
    val newPairs = Seq((2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val inc = Dedup.duplicateClustersIncremental(oldAssign, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.duplicateClusters(
        oldPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
    // same equivalence on the distributed label-propagation path
    val incDist = Dedup.duplicateClustersIncremental(oldAssign, newPairs,
        driverMaxPairs = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incDist == full)
  }

  // ---- quantizeInt8 ------------------------------------------------------------

  test("quantizeInt8: codes stay in [-127,127], absmax maps to ±127, " +
    "dequantization error is bounded by scale/2, zero vector is safe") {
    import graft.sim.Similarity
    val rng = new scala.util.Random(11)
    val rows = (1L to 30L).map(_ -> Array.fill(16)(rng.nextGaussian().toFloat)) :+
      (99L -> Array.fill(16)(0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Long](2).toArray)).toMap
    rows.foreach { case (id, v) =>
      val (scale, q) = got(id)
      assert(q.forall(c => c >= -127 && c <= 127), s"code range id=$id")
      if (id == 99L) assert(scale == 0.0 && q.forall(_ == 0L))
      else {
        assert(q.exists(c => math.abs(c) == 127), s"absmax lane id=$id")
        v.zip(q).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c * scale) <= scale / 2 + 1e-9,
            s"dequant error id=$id")
        }
      }
    }
  }

  // ---- int8 ANN recall ----------------------------------------------------------

  test("int8-dequantized top-k agrees with exact top-k on well-separated " +
    "vectors (quantization preserves the neighborhood)") {
    import graft.sim.Similarity
    val rng = new scala.util.Random(17)
    val rows = (0L to 40L).map(_ -> Array.fill(32)(rng.nextGaussian().toFloat))
      .toList
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, df.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val deq = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .select(col("id").as("vec_id"),
        expr("transform(q, c -> c * scale)").as("embedding"))
    val approx = Similarity.bruteForceTopK(deq,
      deq.where(col("vec_id") < 3), "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall@5 ≥ 0.8 on random gaussians (int8 absmax is ~0.4% error)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall too low: $recall")
  }

  // ---- knSmoothedBigrams ------------------------------------------------------

  test("knSmoothedBigrams matches hand-computed KN arithmetic and sums " +
    "per-context probabilities to one") {
    import graft.text.Text
    // corpus: 'a b' x3, 'a c' x1, 'b c' x2 (no cross-doc bigrams)
    val df = Seq("a b", "a b", "a b", "a c", "b c", "b c")
      .toDF("text")
    val rows = Text.knSmoothedBigrams(df, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    // pairs: (a,b)=3 (a,c)=1 (b,c)=2; cw1: a=4, b=2; n1_left: a=2, b=1;
    // n1_right: b=1, c=2; T=3
    assert(rows(("a", "b")) == ((3L, 4L, 2L, 1L,
      BigDecimal((3 - 0.75) / 4 + 0.75 * 2 / 4 * (1 / 3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(rows(("b", "c"))._1 == 2L && rows(("b", "c"))._2 == 2L)
    // KN interpolation conserves mass: sum over observed w2 of p_kn(w2|w1)
    // plus the unobserved-mass remainder lambda(w1)*(1 - sum of observed
    // continuation probs) equals 1 for every context
    Seq("a", "b").foreach { w1 =>
      val obs = rows.collect { case ((`w1`, w2), v) => (w2, v) }
      val cw1 = obs.head._2._2.toDouble
      val lam = 0.75 * obs.head._2._3 / cw1
      val contSum = obs.map(_._2._4).sum / 3.0
      val total = obs.map(_._2._5).sum + lam * (1.0 - contSum)
      assert(math.abs(total - 1.0) < 1e-5, s"mass off for $w1: $total")
    }
  }

  // ---- round-9 operator edges ---------------------------------------------

  test("round-9 operators: degenerate inputs behave, never throw") {
    import graft.text.{Sampling, Text}
    import graft.sim.Similarity
    // gopherRules: empty and whitespace-only text → zero counts, pass=false
    val g = Text.gopherRules(
      Seq((1L, ""), (2L, "   \n  \n")).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("n_words"), r.getAs[Boolean]("pass"))).toMap
    assert(g(1L) == ((0, false)) && g(2L) == ((0, false)))
    // mmrSelect: k larger than the corpus stops early, no crash
    val two = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val m = Similarity.mmrSelect(two, "vec_id", "embedding",
      Array(1.0f, 0.0f), k = 10, lambda = 0.5)
    assert(m.count() == 2)
    // mixtureTemperature: a single domain takes the whole budget
    val one = Sampling.mixtureTemperature(
      Seq((1L, "only"), (2L, "only")).toDF("id", "dom"), "dom",
      alpha = 0.7, budget = 99L).collect()(0)
    assert(one.getDouble(3) == 1.0 && one.getLong(4) == 99L)
    // pageRank: a self-loop node and an isolated edge coexist; mass
    // stays positive everywhere and the totals are reproducible
    val pr = graft.graph.Graph.pageRank(
      Seq(("a", "a"), ("b", "c")).toDF("s", "d"), "s", "d", iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr.size == 3 && pr.values.forall(_ > 0))
    assert(pr("a") > pr("c")) // self-loop retains mass; c only receives
    // bm25TopK: terms absent from the corpus → empty result, no crash
    val b = Text.bm25TopK(Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      "doc_id", "text", terms = Seq("zzz"), topK = 5)
    assert(b.count() == 0)
    // groupKmvDistinct: all-null value column → empty relation
    val k = graft.stats.Sketches.groupKmvDistinct(
      Seq(("g", Option.empty[String])).toDF("grp", "v"), "grp", "v", k = 8)
    assert(k.count() == 0)
  }

  test("late-round-9 operators: degenerate inputs behave, never throw") {
    import graft.text.{Sampling, Text}
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ws = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    // winnow: empty/whitespace corpora yield no fingerprints, no pairs
    assert(Dedup.winnowFingerprints(ws, "doc_id", "text").count() == 0)
    assert(Dedup.winnowPairs(empty, "doc_id", "text").count() == 0)
    // boilerplateStrip: whitespace-only docs drop out (no segments)
    val bs = Dedup.boilerplateStrip(
      ws.withColumn("src", lit("a")), "doc_id", "text", "src")
    assert(bs.count() == 0)
    // spanCorrupt: empty corpus and whitespace docs produce nothing
    assert(Sampling.spanCorrupt(ws, "doc_id", "text").count() == 0)
    // editVerifyPairs: empty candidate set -> empty, no crash
    assert(Dedup.editVerifyPairs(ws, "doc_id", "text",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    // contaminationFraction: empty eval set -> all zero fractions
    val cf = Dedup.contaminationFraction(
      Seq((1L, "five tokens of real text here please")).toDF("doc_id", "text"),
      empty, "doc_id", "text")
      .collect()(0)
    assert(cf.getLong(2) == 0L && cf.getDouble(3) == 0.0)
    // dupSourceMatrix: no pairs -> empty matrix
    assert(Dedup.dupSourceMatrix(
      Seq((1L, "a")).toDF("doc_id", "src"), "doc_id", "src",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    // clusterDocumentsByQuality: no pairs -> all singletons, all kept
    val cq = Dedup.clusterDocumentsByQuality(
      Seq(1L, 2L).toDF("doc_id"), "doc_id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      Seq((1L, 0.5)).toDF("doc_id", "quality"), "doc_id", "quality")
      .collect()
    assert(cq.length == 2 && cq.forall(_.getBoolean(4)))
    // groupPercentRank: all-equal values -> everyone at 0.0
    val pr = Sampling.groupPercentRank(
      Seq(("a", 1.0), ("a", 1.0), ("a", 1.0)).toDF("g", "v"), "g", "v")
      .select("pct_rank").as[Double].collect()
    assert(pr.forall(_ == 0.0))
    // waterfillQuota: zero budget -> zero quotas, nothing filled
    val wf = Sampling.waterfillQuota(
      Seq(("x", "a"), ("y", "b")).toDF("id", "g"), "g", budget = 0L)
      .collect()
    assert(wf.forall(r => r.getLong(2) == 0L && !r.getBoolean(3)))
    // vocabSizeForCoverage on an empty corpus -> empty report
    assert(Text.vocabSizeForCoverage(empty, "text").count() == 0)
    // pmiCollocations: corpus below the count floor -> empty
    assert(Text.pmiCollocations(
      Seq((1L, "one two three")).toDF("doc_id", "text"), "text",
      minCount = 5).count() == 0)
    // classTfIdfTopK: single class still ranks (A/f = mass/f)
    assert(Text.classTfIdfTopK(
      Seq((1L, "a a b", "s")).toDF("doc_id", "text", "src"),
      "src", "text", topK = 1).count() == 1)
    // dedupYieldProfile: no pairs -> one all-singleton row, share 1.0
    val dy = Dedup.dedupYieldProfile(Seq(1L, 2L).toDF("doc_id"), "doc_id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).collect()
    assert(dy.length == 1 && dy(0).getLong(0) == 1L &&
      dy(0).getDouble(3) == 1.0)
  }

  // ---- zipfFit ----------------------------------------------------------------

  test("zipfFit recovers the slope of an exact power-law corpus") {
    import graft.text.Text
    // term t_r appears floor(1000 / r) times -> ln f = ln 1000 - ln r,
    // slope exactly -1 on the log-log grid, R^2 ~ 1
    val words = (1 to 50).flatMap(r => Seq.fill(1000 / r)(f"w$r%03d"))
    val df = Seq(words.mkString(" ")).toDF("text")
    val row = Text.zipfFit(df, "text", topN = 50).collect()(0)
    assert(row.getLong(0) == 50L)
    val slope = row.getDouble(1)
    assert(slope > -1.05 && slope < -0.95, s"slope off: $slope")
    assert(row.getDouble(3) > 0.99, s"r2 off: ${row.getDouble(3)}")
  }

  // ---- clusterOutliers --------------------------------------------------------

  test("clusterOutliers flags a planted far point and nothing from the " +
    "tight blobs") {
    val rng = new scala.util.Random(3)
    def near(cx: Double): Array[Float] =
      Array.tabulate(8)(i =>
        (cx + (if (i == 0) 0.0 else rng.nextGaussian() * 0.05)).toFloat)
    // two tight blobs at 0 and 10, plus one point flung off blob A
    val rows = (1L to 20L).map(_ -> near(0.0)) ++
      (21L to 40L).map(_ -> near(10.0)) :+
      (99L -> Array.tabulate(8)(i => if (i == 1) 4.0f else 0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val out = Clustering.clusterOutliers(df, "vec_id", "embedding",
      k = 2, iters = 3, seed = 1L, zThreshold = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the planted point is flagged, with a z far above any natural
    // blob-scatter point that clears 2σ
    assert(out.contains(99L), s"planted outlier missing: $out")
    val natural = out - 99L
    assert(natural.values.forall(_ < out(99L) / 2),
      s"planted z should dominate: $out")
  }

  // ---- mixtureTemperature ---------------------------------------------------

  test("mixtureTemperature: alpha=1 is proportional, alpha=0 is uniform, " +
    "alpha<1 upweights the tail") {
    import graft.text.Sampling
    val df = (Seq.fill(80)("big") ++ Seq.fill(15)("mid") ++ Seq.fill(5)("tiny"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "dom")
    def run(alpha: Double) = Sampling
      .mixtureTemperature(df, "dom", alpha, budget = 1000000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val prop = run(1.0)
    assert(prop("big")._2 == 0.8 && prop("big")._3 == 0.8)
    assert(prop("big")._4 == 800000L && prop("tiny")._4 == 50000L)
    val unif = run(0.0)
    assert(unif.values.map(_._3).toSet.size == 1) // equal weights
    assert(unif("tiny")._4 == 1000000L / 3)
    val flat = run(0.7)
    assert(flat("tiny")._3 > flat("tiny")._2) // tail upweighted
    assert(flat("big")._3 < flat("big")._2) // head flattened
    // quotas sum to ≤ budget (floor division) and within one unit each
    assert(flat.values.map(_._4).sum <= 1000000L &&
      flat.values.map(_._4).sum > 1000000L - 3)
  }

  // ---- bm25TopK -------------------------------------------------------------

  test("bm25TopK: matches a driver-side formula replay and prefers " +
    "term-dense short documents") {
    import graft.text.Text
    val docs = Seq(
      (1L, "spark table merge table"), // 2×table 1×merge, dl 4
      (2L, "table"), // 1×table, dl 1 (short → high per-term weight)
      (3L, "stream stream stream other words here padding out length"),
      (4L, "nothing relevant at all in this one"),
      (5L, "merge table stream")).toDF("doc_id", "text")
    val got = Text.bm25TopK(docs, "doc_id", "text",
      terms = Seq("table", "merge", "stream"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toList
    // driver replay
    val toks = Map(1L -> Seq("spark", "table", "merge", "table"),
      2L -> Seq("table"),
      3L -> Seq("stream", "stream", "stream", "other", "words", "here",
        "padding", "out", "length"),
      4L -> Seq("nothing", "relevant", "at", "all", "in", "this", "one"),
      5L -> Seq("merge", "table", "stream"))
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / toks.size
    def grid(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val terms = Seq("table", "merge", "stream")
    val dfm = terms.map(t =>
      t -> toks.values.count(_.contains(t)).toDouble).toMap
    val idf = terms.map(t =>
      t -> grid(math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)))).toMap
    val expect = toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      val units = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) 0L
        else math.floor(idf(t) * (tf * 2.2 /
          (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 1e6 + 0.5).toLong
      }.sum
      id -> units
    }.filter(_._2 > 0).toList.sortBy { case (id, u) => (-u, id) }
    assert(got == expect)
    // the zero-match doc is absent; the term-dense docs lead
    assert(!got.exists(_._1 == 4L))
    assert(got.head._1 == 5L || got.head._1 == 1L)
  }

  // ---- groupKmvDistinct -----------------------------------------------------

  test("groupKmvDistinct: exact below k, within the KMV error band above " +
    "k, and slice-mergeable") {
    import graft.stats.Sketches
    val rows =
      (1 to 2000).map(i => ("big", s"u$i")) ++ // 2000 distinct, each twice
        (1 to 2000).map(i => ("big", s"u$i")) ++
        (1 to 30).map(i => ("small", s"v$i")) // 30 distinct < k
    val df = rows.toDF("grp", "uid")
    val got = Sketches.groupKmvDistinct(df, "grp", "uid", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2), r.getInt(3), r.getDouble(4))).toMap
    val (bn, bk, bm, be) = got("big")
    val (sn, _, sm, se) = got("small")
    assert(bn == 4000L && sn == 30L)
    assert(sm == 30 && se == 30.0) // below k: exact
    assert(bm == 64 && bk.length == 64)
    assert(be > 1400 && be < 2600, s"KMV estimate off: $be") // ±~4σ
    // mergeability: k smallest of the union of slice sketches = sketch
    // of the union (the mergeKmvProfiles contract, checked raw here)
    val sliceA = Sketches.groupKmvDistinct(
      df.where(length(col("uid")) % 2 === 0), "grp", "uid", k = 64)
    val sliceB = Sketches.groupKmvDistinct(
      df.where(length(col("uid")) % 2 =!= 0), "grp", "uid", k = 64)
    val merged = sliceA.unionByName(sliceB)
      .select(col("grp"), explode(col("kmv")).as("h"))
      .groupBy("grp").agg(slice(array_sort(collect_set(col("h"))), 1, 64)
        .as("kmv"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged("big") == bk)
  }

  // ---- pageRank -----------------------------------------------------------

  test("pageRank: matches a driver-side integer replay and ranks the " +
    "hub of a star graph first") {
    import graft.graph.Graph
    // star: everyone links to h; h links back to a only
    val edges = Seq(("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"),
      ("h", "a")).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver replay, same floor arithmetic
    val nodes = Seq("a", "b", "c", "d", "h")
    val n = nodes.size
    val adj = Seq("a" -> "h", "b" -> "h", "c" -> "h", "d" -> "h", "h" -> "a")
    val outdeg = adj.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val r0 = Graph.RankUnit / n
    val tele = r0 * 15L / 100L
    var rank = nodes.map(_ -> r0).toMap
    (1 to 3).foreach { _ =>
      val inflow = adj.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(x => x -> (tele + 85L * inflow.getOrElse(x, 0L) / 100L))
        .toMap
    }
    assert(got == rank)
    assert(got("h") > got("a") && got("a") > got("b")) // hub > its target > leaves
    assert(got("b") == got("c") && got("c") == got("d"))
    // checkpoint cadence is an execution detail, never a result change
    val chk = Graph.pageRank(edges, "src", "dst", iters = 6,
      checkpointInterval = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val noChk = Graph.pageRank(edges, "src", "dst", iters = 6,
      checkpointInterval = 100).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(chk == noChk)
  }

  // ---- personalizedPageRank -------------------------------------------------

  test("personalizedPageRank: mass stays in the seed neighborhood and " +
    "unreachable nodes drain to zero") {
    import graft.graph.Graph
    // a -> b -> c chain plus an unreachable island d -> e
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"),
      ("e", "d")).toDF("s", "t")
    val got = Graph.personalizedPageRank(edges, "s", "t",
      seeds = Seq("a"), iters = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver replay with the same floor arithmetic
    val nodes = Seq("a", "b", "c", "d", "e")
    val adj = Seq("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "e", "e" -> "d")
    val outdeg = adj.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val r0 = Graph.RankUnit / 1
    val tele = r0 * 15L / 100L
    var rank = nodes.map(x => x -> (if (x == "a") r0 else 0L)).toMap
    (1 to 4).foreach { _ =>
      val inflow = adj.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => rank(s) / outdeg(s) }.sum
      }
      rank = nodes.map(x => x ->
        ((if (x == "a") tele else 0L) +
          85L * inflow.getOrElse(x, 0L) / 100L)).toMap
    }
    assert(got == rank)
    // all mass lives in the seed's component (a pulse travels the cycle,
    // so per-node order is phase-dependent — the component split is not)
    assert(Seq("a", "b", "c").map(got).sum > 0)
    assert(got("d") == 0L && got("e") == 0L) // island drains
  }

  // ---- mmrSelect ----------------------------------------------------------

  test("mmrSelect: matches a driver-side greedy MMR replay and skips the " +
    "near-clone a plain top-k would take") {
    import graft.sim.Similarity
    val rng = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val q = unit(Array.fill(8)(rng.nextGaussian().toFloat))
    // id 1 = almost q; id 2 = a near-clone of id 1; id 3.. random
    val eps = () => Array.fill(8)(rng.nextGaussian().toFloat * 0.01f)
    val v1 = unit(q.zip(eps()).map { case (a, b) => a + b })
    val v2 = unit(v1.zip(eps()).map { case (a, b) => a + b })
    val rows = Seq(1L -> v1, 2L -> v2) ++
      (3L to 12L).map(_ -> unit(Array.fill(8)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(df, "vec_id", "embedding", q,
      k = 4, lambda = 0.5).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // driver-side greedy replay (double arithmetic, same tie-break)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    var sel = Vector.empty[Long]
    (1 to 4).foreach { _ =>
      val best = rows.filterNot { case (id, _) => sel.contains(id) }
        .map { case (id, v) =>
          val pen =
            if (sel.isEmpty) 0.0
            else sel.map(s => cos(v, rows.find(_._1 == s).get._2)).max
          (id, 0.5 * cos(v, q) - 0.5 * pen)
        }
        .minBy { case (id, s) => (-s, id) }
      sel :+= best._1
    }
    assert(got.map(_._2).toVector == sel)
    // diversity: 1 picked first; its clone 2 must NOT be pick #2
    assert(got.head._2 == 1L && got(1)._2 != 2L)
  }

  // ---- randomProject ----------------------------------------------------

  test("randomProject: lanes match a driver-side matrix multiply and " +
    "pairwise distances are JL-preserved in aggregate") {
    import graft.sim.Similarity
    val rng = new scala.util.Random(99)
    val rows = (0 until 40).map(i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.randomProject(df, "vec_id", "embedding",
        inDim = 64, outDim = 16, seed = 5L)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // reference: plain matrix multiply in driver code, same fold order
    val planes = Similarity.srpPlanes(64, 16, 5L)
    val scale = 1.0 / math.sqrt(16.0)
    rows.foreach { case (id, v) =>
      val expect = planes.map { p =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += v(i).toDouble * p(i); i += 1 }
        BigDecimal.valueOf(acc * scale)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(java.util.Arrays.equals(out(id), expect), s"lane drift id=$id")
    }
    // JL property: mean squared-distance ratio near 1 (loose band — 16
    // lanes on 40 points is noisy but unbiased)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      (i, vi) <- rows; (j, vj) <- rows if i < j
    } yield d2(out(i), out(j)) /
      d2(vi.map(_.toDouble), vj.map(_.toDouble))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"JL distortion off: $mean")
  }

  // ---- gopherRules --------------------------------------------------------

  test("gopherRules: every measured value and boolean matches a " +
    "hand-computed report on a crafted document") {
    import graft.text.Text
    val doc = "- bullet one\n- bullet two\nthe plain line has " +
      "words and…\nclosing line ..."
    // tokens: -,bullet,one,-,bullet,two,the,plain,line,has,words,and…,
    //         closing,line,... = 15 words, 4 non-empty lines
    val df = Seq((1L, doc)).toDF("id", "text")
    val r = Text.gopherRules(df, "id", "text", minWords = 5,
      requiredStopwords = Seq("the", "and", "line"), minStopwordHits = 2)
      .collect()(0)
    def f(n: String) = r.getAs[Any](n)
    assert(f("n_words") == 15 && f("n_lines") == 4)
    // chars = 1+6+3+1+6+3+3+5+4+3+5+4+7+4+3 = 58; mean = 58/15
    assert(f("mean_word_len") ==
      BigDecimal(58.0 / 15).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // symbol tokens: 'and…' (contains …) and '...' → 2/15
    assert(f("symbol_ratio") == math.rint(2.0 / 15 * 1e6) / 1e6 ||
      f("symbol_ratio") == BigDecimal(2.0 / 15)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // bullet lines: 2 of 4; ellipsis-ending lines: 'words and…' + '...'
    assert(f("bullet_ratio") == 0.5 && f("ellipsis_ratio") == 0.5)
    // alpha words: all but '-','-','...' → 12/15 = 0.8
    assert(f("alpha_ratio") == 0.8)
    // stopword hits: the, and (in 'and…'? no — token is 'and…'), line
    // tokens lowercased exact-match: 'the' and 'line' hit, 'and…' ≠ 'and'
    assert(f("stopword_hits") == 2 && f("ok_stopwords") == true)
    assert(f("ok_word_count") == true && f("ok_mean_len") == true)
    assert(f("ok_symbol") == false) // 2/15 ≈ 0.133 > 0.1
    assert(f("ok_bullet") == true && f("ok_ellipsis") == false)
    assert(f("ok_alpha") == true) // 0.8 >= 0.8 boundary
    assert(f("pass") == false)
  }

  // ---- winnowing fingerprints -----------------------------------------

  private def bruteWinnow(text: String, k: Int, w: Int): Array[Long] = {
    // independent reference: gram hashes via the (already reference-
    // verified) literal path, then explicit window minima
    val g = literalGramHashes(text, k)
    if (g.isEmpty) return Array.emptyLongArray
    val ww = math.min(w, g.length)
    (0 to g.length - ww).map(i => g.slice(i, i + ww).min)
      .distinct.sorted.toArray
  }

  test("winnowHashesKernel == brute window-min reference, incl. edges") {
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog and more words here",
      "exactly four tokens here",          // one gram -> one fingerprint
      "five little tokens right here",     // 2 grams < w -> single window
      "only three tokens", "", "   ",      // < k -> empty
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "rep rep rep rep rep rep rep rep")   // identical grams collapse
    for (t <- cases) {
      val got = Dedup.winnowHashesKernel(t, 4, 4)
      val want = bruteWinnow(t, 4, 4)
      assert(got.toSeq == want.toSeq, s"mismatch for <$t>")
      assert(got.toSeq == got.toSeq.distinct.sorted, s"not canonical <$t>")
    }
    assert(Dedup.winnowHashesKernel(null, 4, 4).isEmpty)
  }

  test("winnowing guarantee: a shared w+k-1-token run yields a shared " +
    "fingerprint and winnowPairs reports the pair") {
    // 7 shared tokens (w+k-1 = 4+4-1) buried in otherwise unrelated text
    val run = "lorem ipsum dolor sit amet consectetur adipiscing"
    val docs = Seq(
      (1L, s"completely different opening words first $run tail one here"),
      (2L, s"$run and then some entirely other continuation words after"),
      (3L, "no overlap with anything else at all in this document text"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 4,
      window = 4)
    val f1 = fps.where(col("id") === 1).select("fp").as[Long].collect().toSet
    val f2 = fps.where(col("id") === 2).select("fp").as[Long].collect().toSet
    assert((f1 & f2).nonEmpty, "guarantee violated: no shared fingerprint")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", k = 4,
      window = 4, minShared = 1, maxFpDf = 100).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("winnowPairs drops boilerplate fingerprints above maxFpDf and " +
    "thins the index vs the full gram stream") {
    val boiler = "standard footer text appears in every single document here"
    val docs = (1L to 6L).map(i =>
      (i, s"unique lead token$i body$i filler$i words$i then $boiler"))
      .toDF("doc_id", "text")
    // every pair shares only the boilerplate run; capping df at 3 (< 6
    // docs) must remove those fingerprints entirely -> no pairs
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text", k = 4,
      window = 4, minShared = 1, maxFpDf = 3)
    assert(pairs.count() == 0)
    // density: selected fingerprints are a strict subset of the grams
    val text = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
    val nG = Dedup.tokenGramHashesKernel(text, 4).length
    val nF = Dedup.winnowHashesKernel(text, 4, 4).length
    assert(nF < nG && nF >= nG / 4)
  }

  // ---- per-source boilerplate strip ------------------------------------

  test("boilerplateStrip removes per-source chrome above the ratio, " +
    "keeps it below, and keeps other sources intact") {
    val foot = "foot bar baz" // one aligned 3-token segment
    val srcA = (1L to 4L).map(i => (i, s"ua$i ub$i uc$i $foot", "a"))
    // source b: trailer in 2 of 10 docs = 20% < the 50% gate
    val srcB = (11L to 20L).map(i =>
      (i, if (i <= 12L) s"va$i vb$i vc$i $foot" else s"va$i vb$i vc$i", "b"))
    val docs = (srcA ++ srcB).toDF("doc_id", "text", "src")
    val out = Dedup.boilerplateStrip(docs, "doc_id", "text", "src",
        segTokens = 3, minDf = 2, maxDfPct = 50)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getString(5))).toMap
    // source a: 4/4 docs carry the trailer -> removed everywhere
    for (i <- 1L to 4L)
      assert(out(i) == (1L, s"ua$i ub$i uc$i"), s"doc $i: ${out(i)}")
    // source b: 20% < 50% -> nothing removed, text reassembled verbatim
    assert(out(11L) == (0L, s"va11 vb11 vc11 $foot"))
    assert(out(15L) == (0L, "va15 vb15 vc15"))
  }

  test("boilerplateStrip: a fully-boilerplate doc survives with empty " +
    "clean_text and exact integer ratio boundary holds") {
    val docs = Seq(
      (1L, "foot bar baz", "a"), (2L, "foot bar baz", "a"),
      (3L, "keep these words", "a"), (4L, "also kept here", "a"))
      .toDF("doc_id", "text", "src")
    // df=2 of 4 docs = exactly 50%: the >= gate must fire at the boundary
    val out = Dedup.boilerplateStrip(docs, "doc_id", "text", "src",
        segTokens = 3, minDf = 2, maxDfPct = 50)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(5))).toMap
    assert(out(1L) == (1L, 1L, "")) // present, emptied
    assert(out(3L) == (1L, 0L, "keep these words"))
  }

  // ---- span corruption --------------------------------------------------

  test("spanCorrupt: sentinels are dense and in order, target inverts the " +
    "mask, and the pair reconstructs the original text") {
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "short doc"), (3L, text))
      .toDF("doc_id", "text")
    val rows = graft.text.Sampling
      .spanCorrupt(docs, "doc_id", "text", spanTokens = 3, maskPct = 40,
        seed = 7L)
      .collect().map(r => r.getLong(0) -> r).toMap
    // determinism: same text + same id inputs give identical outputs
    assert(rows(1L).getString(3) == rows(3L).getString(3) == false ||
      true) // ids differ -> draws differ; just assert shape below
    for (id <- Seq(1L, 2L, 3L)) {
      val r = rows(id)
      val nTok = r.getInt(1); val nMask = r.getLong(2)
      val input = r.getString(3); val target = r.getString(4)
      val sentinel = "<extra_id_(\\d+)>".r
      val ks = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toList
      assert(ks == ks.indices.toList, s"sentinels not dense/on-order: $ks")
      // target carries the same sentinels in the same order
      val tks = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toList
      assert(tks == ks)
      // reconstruct: replace each sentinel in input by its target span
      val spans = if (target.isEmpty) Map.empty[Int, String]
        else target.split("<extra_id_").filter(_.nonEmpty).map { part =>
          val Array(k, rest) = part.split(">", 2)
          k.toInt -> rest.trim
        }.toMap
      val rebuilt = sentinel.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
      val orig = if (id == 2L) "short doc" else text
      assert(rebuilt == orig, s"doc $id reconstruction failed")
      assert(nTok == orig.split(" ").length)
      assert(nMask == spans.values.map(_.split(" ").length).sum)
    }
  }

  test("spanCorrupt is a pure function of (seed, id, bucket): rerun equal, " +
    "different seed differs somewhere") {
    val docs = (1L to 30L).map(i =>
      (i, (1 to 30).map(j => s"t${i}_$j").mkString(" "))).toDF("doc_id", "text")
    def run(seed: Long) = graft.text.Sampling
      .spanCorrupt(docs, "doc_id", "text", seed = seed)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(run(7L) == run(7L))
    assert(run(7L) != run(8L))
  }

  // ---- edit-distance verify tier ----------------------------------------

  test("editVerifyPairs computes exact Levenshtein and the integer dup " +
    "gate at the boundary") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog todaX"), // 1 sub
      (3L, "completely unrelated content with none shared at all"),
      (4L, "aaaaaaaaba"), (5L, "aaaaaaaaaa")) // dist 1, len 10 -> 10%
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.editVerifyPairs(docs, "doc_id", "text", pairs,
        simPct = 90)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(out((1L, 2L)) == (1, 49, true))   // 1/49 ~ 2% <= 10%
    assert(out((4L, 5L)) == (1, 10, true))   // exactly 10% -> <= fires
    val (d13, _, dup13) = out((1L, 3L))
    assert(d13 > 20 && !dup13)
    // boundary the other way: simPct=91 -> 1*100 <= 10*9 is false
    val strict = Dedup.editVerifyPairs(docs, "doc_id", "text",
        Seq((4L, 5L)).toDF("id_a", "id_b"), simPct = 91)
      .collect().head
    assert(!strict.getBoolean(4))
  }

  // ---- contamination fraction -------------------------------------------

  test("contaminationFraction: graded per-doc overlap with the eval set") {
    val run = "alpha beta gamma delta epsilon" // one shared 5-gram
    val eval = Seq((100L, s"$run and some eval only suffix words here"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"$run tail one two three four"),        // shares 1 of 9 grams
      (2L, "nothing in common with the benchmark"), // 0 hits
      (3L, s"$run and some eval only suffix words here")) // full copy
      .toDF("doc_id", "text")
    val out = Dedup.contaminationFraction(corpus, eval, "doc_id", "text",
        k = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(2L)._2 == 0L && out(2L)._3 == 0.0)
    assert(out(3L)._2 == out(3L)._1 && out(3L)._3 == 1.0) // verbatim copy
    val (n1, m1, f1) = out(1L)
    assert(m1 >= 1 && m1 < n1 && f1 > 0.0 && f1 < 1.0)
  }

  // ---- cross-source duplication matrix -----------------------------------

  test("dupSourceMatrix rolls pairs to unordered source cells with exact " +
    "possible-pair denominators") {
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), // 3 docs in a
      (4L, "b"), (5L, "b"))            // 2 docs in b
      .toDF("doc_id", "src")
    val pairs = Seq((1L, 2L), (1L, 4L), (4L, 1L), (2L, 5L))
      .toDF("id_a", "id_b")
    val out = Dedup.dupSourceMatrix(docs, "doc_id", "src", pairs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("a", "a")) == (1L, 3L, math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6))
    assert(out(("a", "b")) == (3L, 6L, 0.5)) // both directions fold to a<=b
  }

  // ---- quality-aware representative pick ----------------------------------

  test("clusterDocumentsByQuality keeps the argmax-quality member, min-id " +
    "on ties, singletons keep themselves") {
    val docs = (1L to 5L).map(i => Tuple1(i)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val scores = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.5))
      .toDF("doc_id", "quality")
    val out = Dedup.clusterDocumentsByQuality(docs, "doc_id", pairs,
        scores, "doc_id", "quality")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    // cluster {1,2,3}: 2 and 3 tie at 0.9 -> min id 2 kept
    assert(out(2L)._3 && !out(1L)._3 && !out(3L)._3)
    assert(Seq(1L, 2L, 3L).forall(i => out(i)._2 == 3L))
    // singletons keep themselves regardless of score
    assert(out(4L) == (4L, 1L, true) && out(5L) == (5L, 1L, true))
  }

  // ---- embedding whitening ------------------------------------------------

  test("whiten: per-dimension mean 0 / sample std 1, constant dims to 0") {
    val vecs = Seq(
      (1L, Array(1.0f, 5.0f, 2.0f)),
      (2L, Array(3.0f, 5.0f, 4.0f)),
      (3L, Array(5.0f, 5.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val w = graft.sim.Similarity.whiten(vecs, "vec_id", "embedding")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    // dim 0: mean 3, std 2 -> (-1, 0, 1); dim 1 constant -> 0
    assert(w.map(_._2(0)).toSeq == Seq(-1.0, 0.0, 1.0))
    assert(w.forall(_._2(1) == 0.0))
    // dim 2: mean 5, var ((4+25+16) - 15*15/3)/2 = 13/2... check moments
    val xs = Seq(2.0, 4.0, 9.0); val m = xs.sum / 3
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / 2)
    for (((_, vw), x) <- w.zip(xs))
      assert(math.abs(vw(2) - (x - m) / sd) < 1e-12)
  }

  // ---- vocab cutoff ---------------------------------------------------------

  test("vocabSizeForCoverage: exact integer coverage gate at the boundary") {
    // masses: a=6, b=3, c=1 -> total 10; 50% -> a alone (60%); 90% -> a+b
    // (90% exactly, >= fires); 99% -> all three
    val docs = Seq((1L, "a a a a a a b b b c")).toDF("doc_id", "text")
    val out = graft.text.Text.vocabSizeForCoverage(docs, "text",
        targetsPct = Seq(50, 90, 99))
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(50) == (1, 6L, 10L, 0.6))
    assert(out(90) == (2, 9L, 10L, 0.9))
    assert(out(99) == (3, 10L, 10L, 1.0))
  }

  // ---- incremental quality maintenance -------------------------------------

  test("qualityIncremental: merge of carried + rescored equals a full " +
    "recompute, and only the delta is marked refreshed") {
    val mk = (i: Long, t: String) => (i, t)
    val oldDocs = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog"),
      mk(2L, "another document with some words in it"),
      mk(3L, "a third one that will change")).toDF("doc_id", "text")
    val newDocs = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog"), // unchanged
      mk(3L, "a third one that has now changed"),            // changed
      mk(4L, "a brand new arrival document")).toDF("doc_id", "text")
    val oldScores = graft.text.Text.qualityScore(oldDocs, "text")
      .select("doc_id", "quality")
    val inc = graft.pipelines.Curate.qualityIncremental(oldScores,
        oldDocs, newDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getBoolean(2))).toMap
    val full = graft.text.Text.qualityScore(newDocs, "text")
      .select("doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inc.keySet == Set(1L, 3L, 4L)) // removed doc 2 dropped
    assert(inc.view.mapValues(_._1).toMap == full) // merge == full
    assert(!inc(1L)._2 && inc(3L)._2 && inc(4L)._2)
  }

  // ---- PMI collocations ------------------------------------------------------

  test("pmiCollocations: a glued pair outranks independent pairs and the " +
    "count floor applies") {
    // 'new york' always adjacent; fillers are shuffled independently
    val glue = (1 to 20).map(i =>
      (i.toLong, s"new york w${i % 7} w${(i * 3) % 7} new york w${i % 5}"))
    val docs = glue.toDF("doc_id", "text")
    val out = graft.text.Text.pmiCollocations(docs, "text", minCount = 5,
      topK = 10).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getString(0) == "new" && top.getString(1) == "york")
    // every returned pair respects the floor
    assert(out.forall(_.getLong(2) >= 5L))
    // pmi ordering is non-increasing
    val pmis = out.map(_.getDouble(5)).toSeq
    assert(pmis == pmis.sorted.reverse)
  }

  // ---- perceptual-hash media pairs ------------------------------------------

  test("perceptualHashPairs == brute-force hamming ball per modality; " +
    "identical bytes pair at hamming 0, modalities never mix") {
    import graft.multimodal.Multimodal
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today ok",
      2L -> "the quick brown fox jumps over the lazy dog today ok", // = 1
      3L -> "a completely different payload of bytes that is long too",
      4L -> "the quick brown fox jumps over the lazy dog today ok", // = 1, other modality
      5L -> "yet another rather different chunk of content right here")
    val media = texts.toDF("media_id", "text").select(
      col("media_id"),
      when(col("media_id") === 4L, "audio").otherwise("image").as("modality"),
      col("text").cast("binary").as("content"))
    val dec = new Multimodal.HashFeatureDecoder(16)
    val got = Multimodal.perceptualHashPairs(media, dec, bands = 8,
        maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        r.getInt(3)).toMap
    // brute reference with the same decoder
    def sig(t: String): Long = {
      val f = dec.features("x", t.getBytes("UTF-8")).get.map(_.toDouble)
      val m = f.foldLeft(0.0)(_ + _) / f.length
      f.zipWithIndex.map { case (x, i) => if (x > m) 1L << i else 0L }.sum
    }
    val mod = (id: Long) => if (id == 4L) "audio" else "image"
    val want = (for {
      (ia, ta) <- texts; (ib, tb) <- texts
      if ia < ib && mod(ia) == mod(ib)
      h = java.lang.Long.bitCount(sig(ta) ^ sig(tb)) if h <= 3
    } yield (mod(ia), ia, ib) -> h).toMap
    assert(got == want)
    assert(got(("image", 1L, 2L)) == 0) // identical bytes
    assert(!got.contains(("image", 1L, 4L)) && !got.contains(("audio", 1L, 4L)))
  }

  // ---- quota sampling -------------------------------------------------------------

  test("quotaSample keeps exactly quota rows per group, deterministically, " +
    "with hash-prefix nesting") {
    val df = (1L to 40L).map(i => (i, if (i <= 30) "a" else "b"))
      .toDF("id", "g")
    val q1 = Seq(("a", 5L), ("b", 3L)).toDF("g", "quota")
    def run(q: org.apache.spark.sql.DataFrame) = graft.text.Sampling
      .quotaSample(df, "g", "id", q, "g", "quota", seed = 9L)
      .select("g", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val s1 = run(q1)
    assert(s1.count(_._1 == "a") == 5 && s1.count(_._1 == "b") == 3)
    assert(run(q1).toSet == s1.toSet) // rerun-identical
    // nesting: a smaller quota selects a subset of the larger selection
    val s2 = run(Seq(("a", 2L), ("b", 3L)).toDF("g", "quota"))
    assert(s2.filter(_._1 == "a").toSet
      .subsetOf(s1.filter(_._1 == "a").toSet))
    // quota above supply keeps the whole group
    val s3 = run(Seq(("a", 99L), ("b", 0L)).toDF("g", "quota"))
    assert(s3.count(_._1 == "a") == 30 && !s3.exists(_._1 == "b"))
  }

  // ---- tokenizer fertility -------------------------------------------------------

  test("tokenizerFertility: in-vocab words cost 1, OOV words fall back " +
    "to characters") {
    val docs = Seq(
      (1L, "aa aa aa bb bb zzzz", "s1"), // vocab(2) = {aa, bb}; zzzz OOV
      (2L, "aa qqq", "s2"))              // qqq OOV (3 chars)
      .toDF("doc_id", "text", "src")
    val out = graft.text.Text.tokenizerFertility(docs, "src", "text",
        vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // s1: 6 words; 5 in vocab (1 each) + zzzz -> 4 chars = 9 emitted
    assert(out("s1") == (6L, 9L, 1L, 1.5))
    // s2: 2 words; aa=1, qqq->3 = 4 emitted
    assert(out("s2") == (2L, 4L, 1L, 2.0))
  }

  // ---- leak-free split and tradeoff curve ---------------------------------------

  test("leakFreeSplit: every member of a duplicate cluster lands in the " +
    "same split, singletons split independently") {
    val docs = (1L to 200L).map(Tuple1(_)).toDF("doc_id")
    val pairs = (1L to 99L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = graft.pipelines.Curate.leakFreeSplit(docs, "doc_id", pairs,
        seed = 31L, cuts = Seq(("train", 0.5), ("test", 0.5)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // the 1..100 chain is one cluster -> one split for all
    assert(out.filterKeys(_ <= 100L).values.map(_._2).toSet.size == 1)
    // singletons 101..200 split by their own ids -> both splits occur
    assert(out.filterKeys(_ > 100L).values.map(_._2).toSet.size == 2)
  }

  test("qualityTradeoffCurve: hand-computed reverse cumulative kept mass") {
    val scored = Seq(
      (0.05, 10L), (0.15, 20L), (0.15, 30L), (0.95, 40L))
      .toDF("quality", "n_tokens")
    val out = graft.text.QualityModel.qualityTradeoffCurve(scored,
        "quality", "n_tokens", bins = 10)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out(0.0) == (4L, 100L, 1.0, 1.0))
    assert(out(0.1) == (3L, 90L, 0.75, 0.9))
    assert(out(0.9) == (1L, 40L, 0.25, 0.4))
    assert(out.size == 3) // only occupied bins emit a row
  }

  // ---- event funnel and retention ---------------------------------------------

  test("funnelSteps: order matters, out-of-order purchases don't count, " +
    "reached counts completed steps") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE the first view -> step 2 never fires
      (2L, "purchase", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(3)),
      // user 3: view only
      (3L, "view", ts(5)),
      // user 4: no funnel events at all
      (4L, "error", ts(1)))
      .toDF("user_id", "event_type", "ts")
    val out = graft.streaming.Events.funnelSteps(ev, "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
    // same-timestamp step counts (>= semantics)
    val sameTs = Seq((9L, "view", ts(1)), (9L, "click", ts(1)))
      .toDF("user_id", "event_type", "ts")
    assert(graft.streaming.Events.funnelSteps(sameTs, "user_id",
      "event_type", "ts", Seq("view", "click")).collect()(0).getInt(3) == 2)
  }

  test("retentionCohorts: first-day cohorting with exact day offsets") {
    def ts(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    val ev = Seq(
      (1L, ts(1, 5)), (1L, ts(1, 9)), (1L, ts(3, 1)), // cohort d0, offsets 0,2
      (2L, ts(2, 1)), (2L, ts(3, 23)))                // cohort d1, offsets 0,1
      .toDF("user_id", "ts")
    val out = graft.streaming.Events.retentionCohorts(ev, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val d0 = out.keys.map(_._1).min
    assert(out((d0, 0L)) == 1L && out((d0, 2L)) == 1L)
    assert(out((d0 + 1, 0L)) == 1L && out((d0 + 1, 1L)) == 1L)
    assert(out.size == 4)
  }

  // ---- water-filling quota ---------------------------------------------------

  test("waterfillQuota: undersupplied groups taken whole, level + " +
    "remainder for the rest, sum == min(budget, supply)") {
    // supplies: a=2, b=3, c=10, d=10; budget 17
    // -> a,b filled (2+3=5), level = (17-5)/2 = 6, c,d get 6; sum 17
    val rows = (1 to 2).map(i => s"a$i" -> "a") ++
      (1 to 3).map(i => s"b$i" -> "b") ++
      (1 to 10).map(i => s"c$i" -> "c") ++ (1 to 10).map(i => s"d$i" -> "d")
    val df = rows.toDF("id", "g")
    def run(b: Long) = graft.text.Sampling.waterfillQuota(df, "g", b)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val q17 = run(17L)
    assert(q17("a") == (2L, 2L, true) && q17("b") == (3L, 3L, true))
    assert(q17("c") == (10L, 6L, false) && q17("d") == (10L, 6L, false))
    // budget 18: remainder 1 goes to the smaller-ranked uncapped (c)
    val q18 = run(18L)
    assert(q18("c") == (10L, 7L, false) && q18("d") == (10L, 6L, false))
    // budget >= total supply: everyone filled whole
    val q99 = run(99L)
    assert(q99.values.forall { case (n, q, f) => q == n && f })
    // budget below the smallest supply: nobody filled, uniform level
    val q4 = run(4L)
    assert(q4.values.map(_._2).sum == 4L && q4.values.forall(!_._3))
    assert(Seq(17L, 18L, 4L).forall(b => run(b).values.map(_._2).sum == b))
  }

  // ---- dedup yield profile -----------------------------------------------

  test("dedupYieldProfile: size distribution and shares from the pair graph") {
    val docs = (1L to 6L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.dedupYieldProfile(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // one 3-cluster, one 2-cluster, one singleton
    assert(out(3L) == (1L, 3L, 0.5))
    assert(out(2L) == (1L, 2L, math.floor(2.0 / 6 * 1e6 + 0.5) / 1e6))
    assert(out(1L) == (1L, 1L, math.floor(1.0 / 6 * 1e6 + 0.5) / 1e6))
  }

  // ---- class TF-IDF ----------------------------------------------------------

  test("classTfIdfTopK: terms exclusive to a class outrank shared ones") {
    val docs = Seq(
      (1L, "shared words here plus alpha alpha alpha", "s1"),
      (2L, "shared words here plus beta beta beta", "s2"))
      .toDF("doc_id", "text", "src")
    val out = graft.text.Text.classTfIdfTopK(docs, "src", "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // top term of s1 is 'alpha' (tf 3, corpus f 3), of s2 is 'beta'
    val s1 = out.keys.filter(_._1 == "s1").map(_._2).toSet
    assert(s1.contains("alpha"))
    assert(out(("s1", "alpha"))._1 == 3L && out(("s1", "alpha"))._2 == 3L)
    assert(out.keys.filter(_._1 == "s2").map(_._2).toSet.contains("beta"))
    // exclusive term outranks any shared term within its class
    val sharedUnits = out.collect { case ((g, t), v)
      if g == "s1" && t != "alpha" => v._3 }
    assert(sharedUnits.forall(_ < out(("s1", "alpha"))._3))
  }

  // ---- per-group percent rank ---------------------------------------------

  test("groupPercentRank matches SQL percent_rank semantics incl. ties " +
    "and single-member groups") {
    val df = Seq(
      ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.2), ("a", 4L, 0.4),
      ("b", 5L, 0.7))
      .toDF("src", "doc_id", "q")
    val out = graft.text.Sampling.groupPercentRank(df, "src", "q")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("pct_rank")).toMap
    assert(out(1L) == 0.0)
    assert(out(2L) == math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6) // rank_min 2
    assert(out(2L) == out(3L)) // ties share the percentile
    assert(out(4L) == 1.0)
    assert(out(5L) == 0.0) // single-member group
  }

  // ---- calibration report -----------------------------------------------

  test("calibrationReport: hand-computed bins, exact-integer ECE, and the " +
    "score=1.0 top-bin clamp") {
    val scored = Seq(
      (0.05, 0.0), (0.05, 0.0), (0.05, 0.0), (0.05, 1.0), // bin 0
      (0.95, 1.0), (1.0, 1.0))                            // bin 9 (clamped)
      .toDF("score", "y")
    val out = graft.text.QualityModel
      .calibrationReport(scored, "score", "y", bins = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(0, 9))
    val b0 = out(0)
    assert(b0.getLong(1) == 4L && b0.getLong(2) == 200000L &&
      b0.getLong(3) == 1L)
    assert(b0.getDouble(4) == 0.05 && b0.getDouble(5) == 0.25 &&
      b0.getDouble(6) == 0.2) // dev = |200000 - 1e6| = 800000 over 4e6
    val b9 = out(9)
    assert(b9.getLong(1) == 2L && b9.getLong(2) == 1950000L &&
      b9.getLong(3) == 2L)
    assert(b9.getDouble(4) == 0.975 && b9.getDouble(5) == 1.0 &&
      b9.getDouble(6) == 0.025) // dev = |1950000 - 2e6| = 50000 over 2e6
    // ECE = (800000 + 50000) / (6 * 1e6)
    assert(out.values.map(_.getDouble(7)).toSet == Set(850000.0 / 6e6 match {
      case x => math.floor(x * 1e6 + 0.5) / 1e6 // round(.,6) both rows
    }))
  }
}
