package graft

import org.apache.spark.sql.functions._
import graft.text.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hexThreshold edges and monotonicity") {
    assert(Sampling.hexThreshold(0.0) == "000000000000000")
    assert(Sampling.hexThreshold(1.0) == "g")
    val ts = Seq(0.1, 0.25, 0.5, 0.8, 0.99).map(Sampling.hexThreshold)
    assert(ts == ts.sorted, "thresholds must be monotone in the rate")
    assert(ts.forall(t => t.length == 15 && t.forall("0123456789abcdef".contains(_))))
  }

  test("splitAssign covers every row, hits fractions, and is stable") {
    val ids = (0 until 20000).toDF("id")
    val cuts = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.splitAssign(ids, "id", 42L, cuts).cache()
    val byCut = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byCut.values.sum == 20000L, "every row must land in exactly one split")
    assert(math.abs(byCut("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(byCut("val") / 20000.0 - 0.1) < 0.01)
    assert(math.abs(byCut("test") / 20000.0 - 0.1) < 0.01)
    // determinism: independent evaluation produces the identical assignment
    val again = Sampling.splitAssign(ids.repartition(7), "id", 42L, cuts)
    assert(out.join(again.withColumnRenamed("split", "s2"), "id")
      .where(col("split") =!= col("s2")).count() == 0)
    out.unpersist()
  }

  test("stratifiedSample rates per stratum; samples are nested across rates") {
    val rows = (0 until 12000).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
      .toDF("id", "lang")
    val s1 = Sampling.stratifiedSample(rows, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.2), 0.1, 7L).cache()
    val n = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(n("en") / 4000.0 - 0.5) < 0.05)
    assert(math.abs(n("de") / 4000.0 - 0.2) < 0.04)
    assert(math.abs(n("fr") / 4000.0 - 0.1) < 0.03)
    // nested: the 0.2-rate sample of en is a subset of the 0.5-rate one
    val s2 = Sampling.stratifiedSample(rows, "id", "lang",
      Map("en" -> 0.2, "de" -> 0.2), 0.1, 7L)
    assert(s2.select("id").except(s1.select("id")).count() == 0,
      "hash-threshold samples must be nested across rates")
    s1.unpersist()
  }

  test("sampleWithRepetition: expected copy counts, full copies always kept, nested") {
    val rows = (0 until 9000).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val up = Sampling.sampleWithRepetition(rows, "id", "src",
      Map("src0" -> 2.5, "src1" -> 1.0), 0.4, 21L).cache()
    val n = up.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(n("src0") / 3000.0 - 2.5) < 0.1)
    assert(n("src1") == 3000L, "rate 1.0 must keep exactly one copy of every row")
    assert(math.abs(n("src2") / 3000.0 - 0.4) < 0.05)
    // floor copies are unconditional: every src0 row appears with rep 0 and 1
    assert(up.where(col("src") === "src0" && col("rep") < 2).count() == 6000L)
    // nested: the 2.2x sample is contained in the 2.5x sample
    val up22 = Sampling.sampleWithRepetition(rows, "id", "src",
      Map("src0" -> 2.2, "src1" -> 1.0), 0.4, 21L)
    assert(up22.select("id", "rep").except(up.select("id", "rep")).count() == 0)
    up.unpersist()
  }

  test("weightedSample: without replacement, deterministic, weight-biased") {
    val rows = (0 until 2000).map(i => (i.toLong, if (i < 200) 10.0 else 1.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(rows, "id", "w", n = 400, seed = 3L)
      .select("id").as[Long].collect().toSeq
    assert(s1.size == 400 && s1.distinct.size == 400) // without replacement
    // determinism under repartition
    val s2 = Sampling.weightedSample(rows.repartition(13), "id", "w",
      n = 400, seed = 3L).select("id").as[Long].collect().toSeq
    assert(s1.toSet == s2.toSet)
    // 200 heavy rows (w=10) vs 1800 light (w=1): heavy inclusion
    // probability ~4.7x the light one at this draw size — demand the
    // heavy group is clearly overrepresented but not exhaustively taken
    val nHeavy = s1.count(_ < 200)
    assert(nHeavy > 120 && nHeavy < 200,
      s"heavy-weight rows not plausibly biased: $nHeavy of 200 drawn")
    // a different seed draws a different sample
    val s3 = Sampling.weightedSample(rows, "id", "w", n = 400, seed = 4L)
      .select("id").as[Long].collect().toSet
    assert(s3 != s1.toSet)
  }

  test("gumbelTopK: without replacement, deterministic, log-weight-biased, " +
       "and safe at weights exp() would overflow") {
    // log-weights spanning ±700 nats — exp() overflows/underflows a
    // double, the exact regime the log-domain key exists for
    val rows = (0 until 2000).map(i =>
      (i.toLong, if (i < 200) 700.0 else -700.0)).toDF("id", "lw")
    val s1 = Sampling.gumbelTopK(rows, "id", "lw", n = 300, seed = 5L)
      .select("id").as[Long].collect().toSeq
    assert(s1.size == 300 && s1.distinct.size == 300)
    // a 1400-nat gap makes every heavy row beat every light row: the
    // 200 heavy ids must all be in the sample
    assert(s1.count(_ < 200) == 200)
    // determinism under repartition
    val s2 = Sampling.gumbelTopK(rows.repartition(13), "id", "lw",
      n = 300, seed = 5L).select("id").as[Long].collect().toSeq
    assert(s1.toSet == s2.toSet)
    // moderate weights: agreement with weightedSample's ES draw is
    // distributional, not pointwise (different uniforms) — check bias
    val mod = (0 until 2000).map(i =>
      (i.toLong, if (i < 200) math.log(10.0) else 0.0)).toDF("id", "lw")
    val m1 = Sampling.gumbelTopK(mod, "id", "lw", n = 400, seed = 6L)
      .select("id").as[Long].collect().toSeq
    val nHeavy = m1.count(_ < 200)
    assert(nHeavy > 120 && nHeavy < 200,
      s"heavy rows not plausibly biased: $nHeavy of 200 drawn")
  }

  test("dsirLogWeights: target-like docs score above off-target docs, " +
       "weights are repartition-invariant") {
    import graft.text.Text
    // raw corpus: half the docs speak the target vocabulary, half don't
    val raw = (0 until 200).map { i =>
      val words = if (i % 2 == 0) (0 until 20).map(j => s"tgt${j % 7}")
                  else (0 until 20).map(j => s"oth${(i + j) % 90}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val target = (0 until 50).map { i =>
      (1000L + i, (0 until 20).map(j => s"tgt${(i + j) % 7}").mkString(" "))
    }.toDF("doc_id", "text")
    val w = Text.dsirLogWeights(raw, target, "doc_id", "text",
      dim = 64, seed = 17L)
    val byId = w.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2))).toMap
    assert(byId.size == 200 && byId.values.forall(_._1 == 20L))
    val tgtScores = byId.filter(_._1 % 2 == 0).values.map(_._2)
    val othScores = byId.filter(_._1 % 2 == 1).values.map(_._2)
    assert(tgtScores.min > othScores.max,
      s"target-like docs must dominate: min=${tgtScores.min} " +
        s"vs max=${othScores.max}")
    // invariant under physical layout
    val w2 = Text.dsirLogWeights(raw.repartition(7), target.repartition(3),
      "doc_id", "text", dim = 64, seed = 17L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId.forall { case (id, (_, lw)) => w2(id) == lw })
  }

  test("edge cases: empty DSIR target degrades to uniform, gumbelTopK " +
       "with n > rows returns everything") {
    import graft.text.Text
    val raw = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val empty = raw.where(lit(false))
    val w = Text.dsirLogWeights(raw, empty, "doc_id", "text",
        dim = 16, seed = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // no nulls, finite weights: target collapses to the all-alpha prior
    assert(w.length == 2 && w.forall(r => !r._3.isNaN && !r._3.isInfinite))
    val small = Seq((1L, 0.5), (2L, -0.5)).toDF("id", "lw")
    assert(Sampling.gumbelTopK(small, "id", "lw", n = 10, seed = 2L)
      .count() == 2)
  }

  test("withRunningOffset equals the single-partition window reference") {
    val rnd = new scala.util.Random(1)
    val data = (0 until 1000).map(i => (rnd.nextInt(1000000), rnd.nextInt(100).toLong))
      .distinct.toDF("k", "v").repartition(8)
    val got = Sampling.withRunningOffset(data, Seq("k"), col("v"), "off", 8)
      .select("k", "v", "off").as[(Int, Long, Long)].collect().sortBy(_._1)
    val sorted = data.as[(Int, Long)].collect().sortBy(_._1)
    var acc = 0L
    val expect = sorted.map { case (k, v) => val r = (k, v, acc); acc += v; r }
    assert(got.toSeq == expect.toSeq)
  }

  test("shuffleOrder is a deterministic permutation, seed-sensitive") {
    val ids = (0 until 5000).toDF("id")
    val p1 = Sampling.shuffleOrder(ids, "id", 13L).as[(Int, Long)].collect()
    assert(p1.map(_._2).sorted.toSeq == (0L until 5000L), "pos must be a permutation")
    val p1b = Sampling.shuffleOrder(ids.repartition(5), "id", 13L).as[(Int, Long)].collect()
    assert(p1.sortBy(_._1).toSeq == p1b.sortBy(_._1).toSeq, "stable under repartition")
    val p2 = Sampling.shuffleOrder(ids, "id", 14L).as[(Int, Long)].collect()
    assert(p1.sortBy(_._1).map(_._2).toSeq != p2.sortBy(_._1).map(_._2).toSeq,
      "different seed must give a different order")
  }

  test("TrainData.build: curate -> split -> shuffled pack composition") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val out = graft.pipelines.TrainData.build(docs, "doc_id", "text").cache()
    assert(out.count() > 0)
    // the packed set is exactly the train split of the curated corpus
    val curated = graft.pipelines.Curate.curate(docs, "doc_id", "text")
    val train = Sampling.splitAssign(curated.select("doc_id"), "doc_id", 42L,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .where(col("split") === "train").select("doc_id")
    assert(out.select("doc_id").except(train).count() == 0)
    assert(train.except(out.select("doc_id")).count() == 0)
    // offsets accumulate n_tokens in (shuffle-hash, doc_id) order
    val hashes = Sampling.hashFrac(col("doc_id"), 13L)
    val rows = out.withColumn("__h", hashes)
      .select("__h", "doc_id", "n_tokens", "start_offset", "chunk_id")
      .as[(String, Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    var acc = 0L
    rows.foreach { case (_, _, n, off, chunk) =>
      assert(off == acc && chunk == off / 256L)
      acc += n
    }
    out.unpersist()
  }

  test("packSequences: offsets are the running token stream; chunks honor the budget") {
    val rnd = new scala.util.Random(2)
    val docs = (0 until 800).map(i => (i, 1 + rnd.nextInt(300))).toDF("id", "n")
      .repartition(6)
    val packed = Sampling.packSequences(docs, Seq("id"), "n", 512L)
      .select("id", "n", "start_offset", "chunk_id")
      .as[(Int, Int, Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    packed.foreach { case (_, n, off, chunk) =>
      assert(off == acc, s"start_offset must be the exclusive prefix sum (got $off want $acc)")
      assert(chunk == off / 512L)
      acc += n
    }
  }
}
