package graft

import org.apache.spark.sql.functions._
import graft.omics._

/** Golden tests for the per-group model kernels (not DuckDB-expressible,
  * so the evidence lives here). */
class OmicsKernelSpec extends SparkSpec {
  import spark.implicits._

  test("DriverNet greedy cover matches the hand-computed cover") {
    // g1 covers events e1,e2,e3; g2 covers e3,e4; g3 covers e4.
    // Greedy: pick g1 (3), then g2 (1: e4 remains), g3 covers nothing new.
    val mutations = Seq(("p1", "g1"), ("p2", "g1"), ("p1", "g2"), ("p3", "g3"))
      .toDF("patient", "gene")
    val outliers = Seq(("p1", "h1"), ("p1", "h2"), ("p2", "h1"),
      ("p1", "h3"), ("p3", "h3")).toDF("patient", "gene")
    val influence = Seq(("g1", "h1"), ("g1", "h2"), ("g2", "h3"), ("g3", "h3"))
      .toDF("gene_a", "gene_b")
    val cov = DriverNet.coverage(mutations, outliers, influence)
    // g1 -> (p1,h1),(p1,h2),(p2,h1); g2 -> (p1,h3); g3 -> (p3,h3)
    assert(cov.count() == 5)
    val drivers = DriverNet.greedyDrivers(cov, maxDrivers = 5)
      .orderBy("rank").as[(Int, String, Long)].collect().toSeq
    assert(drivers == Seq((1, "g1", 3L), (2, "g2", 1L), (3, "g3", 1L)))
    // the single-plan fixed-depth twin emits the identical cover,
    // including the implicit early exit past the last nonempty pick
    val fused = DriverNet.greedyDriversFused(cov, maxDrivers = 5)
      .orderBy("rank").as[(Int, String, Long)].collect().toSeq
    assert(fused == drivers)
  }

  test("DriverNet permutation null is reproducible") {
    val mutations = Seq(("p1", "g1"), ("p2", "g2"), ("p3", "g1"))
      .toDF("patient", "gene")
    val outliers = Seq(("p1", "h1"), ("p2", "h2"), ("p3", "h1"))
      .toDF("patient", "gene")
    val influence = Seq(("g1", "h1"), ("g2", "h2")).toDF("gene_a", "gene_b")
    val a = DriverNet.permutedTopCovers(mutations, outliers, influence, 3)
      .as[(Int, Long)].collect().toSeq
    val b = DriverNet.permutedTopCovers(mutations, outliers, influence, 3)
      .as[(Int, Long)].collect().toSeq
    assert(a == b && a.size == 3)
  }

  test("DriverNet significance: strong drivers beat the null, weak ones don't") {
    val drivers = Seq((1, "gBig", 50L), (2, "gSmall", 1L))
      .toDF("rank", "driver_gene", "events_covered")
    val nullTops = (0 until 9).map(i => (i, (i % 3 + 2).toLong)) // nulls 2..4
      .toDF("perm", "top_cover")
    val sig = DriverNet.significance(drivers, nullTops)
      .collect().map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(sig("gBig") == 0.1)   // (0+1)/(9+1): no null reaches 50
    assert(sig("gSmall") == 1.0) // (9+1)/(9+1): every null >= 1
  }

  test("beta mixture recovers two well-separated components") {
    // deterministic pseudo-draws from Beta(2,8) (mean .2) and Beta(8,2)
    // (mean .8) via inverse-CDF on a fixed grid
    val lo = (1 to 150).map(i => 0.05 + 0.25 * i / 151.0)       // ~[0.05,0.30]
    val hi = (1 to 150).map(i => 0.70 + 0.25 * i / 151.0)       // ~[0.70,0.95]
    val xs = (lo ++ hi).map(v => ("g", v)).toDF("gene", "value")
    val fit = BetaMixture.fitPerGene(xs, "gene", "value").collect()
    assert(fit.nonEmpty)
    val k = fit.head.n_components
    assert(k == 2, s"expected 2 components, got $k")
    val means = fit.map(_.mean).sorted
    assert(math.abs(means.head - 0.175) < 0.05)
    assert(math.abs(means.last - 0.825) < 0.05)
    assert(math.abs(fit.map(_.weight).sum - 1.0) < 1e-6)
    // determinism
    val fit2 = BetaMixture.fitPerGene(xs, "gene", "value").collect()
    assert(fit.map(_.bic).toSeq == fit2.map(_.bic).toSeq)
    // DM-values against a normal mean of 0.5: low comp hypo, high comp hyper
    val dm = BetaMixture.dmValues(
      BetaMixture.fitPerGene(xs, "gene", "value").toDF(),
      Seq(("g", 0.5)).toDF("gene", "normal_mean"))
      .orderBy("comp").select("state").as[String].collect()
    assert(dm.toSeq == Seq("hypo", "hyper"))
  }

  test("beta mixture fixed-iteration twin recovers the same components") {
    val lo = (1 to 150).map(i => 0.05 + 0.25 * i / 151.0)
    val hi = (1 to 150).map(i => 0.70 + 0.25 * i / 151.0)
    val xs = (lo ++ hi).map(v => ("g", v)).toDF("gene", "value")
    val fixed = BetaMixture.fitPerGeneFixed(xs, "gene", "value", k = 2, iters = 10)
      .orderBy("comp").collect()
    assert(fixed.length == 2)
    val means = fixed.map(_.getDouble(6))
    assert(math.abs(means(0) - 0.175) < 0.05)
    assert(math.abs(means(1) - 0.825) < 0.05)
    assert(math.abs(fixed.map(_.getDouble(5)).sum - 1.0) < 1e-9)
    // ten fixed steps already sit on the converged fit for separated
    // components: parameters match the tol-converged library path closely
    val conv = BetaMixture.fitPerGene(xs, "gene", "value").orderBy("comp").collect()
    assert(conv.length == 2)
    fixed.zip(conv).foreach { case (f, c) =>
      assert(math.abs(f.getDouble(6) - c.mean) < 1e-4,
        s"twin mean ${f.getDouble(6)} vs converged ${c.mean}")
    }
    // bit-determinism across runs (the oracle hash-compare relies on it)
    val again = BetaMixture.fitPerGeneFixed(xs, "gene", "value", k = 2, iters = 10)
      .orderBy("comp").collect()
    assert(fixed.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("beta mixture picks one component for true beta-distributed data") {
    // exact Beta(5,5) quantile draws via bisection on the incomplete beta
    def qbeta(p: Double): Double = {
      var lo = 0.0; var hi = 1.0
      (1 to 60).foreach { _ =>
        val mid = (lo + hi) / 2
        if (graft.stats.Dist.betaInc(5, 5, mid) < p) lo = mid else hi = mid
      }
      (lo + hi) / 2
    }
    val xs = (1 to 200).map(i => ("g", qbeta(i / 201.0))).toDF("gene", "value")
    val fit = BetaMixture.fitPerGene(xs, "gene", "value").collect()
    assert(fit.head.n_components == 1,
      s"expected 1 component, got ${fit.head.n_components} (bic=${fit.head.bic})")
  }

  test("NB GLM detects a strong group effect and a null effect") {
    // group 1 counts ~ 40, group 0 counts ~ 10 -> logFC ~ log(4)
    val strong = (1 to 30).map { i =>
      val g = i % 2
      ("r1", (if (g == 1) 40.0 else 10.0) + (i % 3), g.toDouble, 0.0)
    }
    val nullr = (1 to 30).map(i => ("r2", 20.0 + (i % 5), (i % 2).toDouble, 0.0))
    val df = (strong ++ nullr).toDF("region", "y", "grp", "off")
    val fits = GlmNb.fitPerRegion(df, "region", "y", "grp", "off", dispersion = 0.05)
      .collect().map(r => r.region -> r).toMap
    assert(fits("r1").p_value < 1e-4)
    assert(math.abs(fits("r1").log_fc - math.log(4.0)) < 0.25)
    assert(fits("r2").p_value > 0.1)
    assert(fits("r1").z > 0)
    // analytical anchor: with zero offsets the fitted intercept of the
    // null-ish region satisfies exp(b0) ~ group-0 mean (log link MLE)
    val g0mean = nullr.filter(_._3 == 0.0).map(_._2).sum /
      nullr.count(_._3 == 0.0)
    assert(math.abs(math.exp(fits("r2").intercept) - g0mean) < 2.0)
    // null-model anchor: with zero offsets the intercept-only NB MLE is
    // exactly the overall mean count (the new null_intercept output the
    // residual oracle one-steps against)
    Seq("r1", "r2").foreach { r =>
      val ys = (strong ++ nullr).filter(_._1 == r).map(_._2)
      val overall = ys.sum / ys.length
      // 1e-3 not tighter: the output intercept is rounded at 1e-6 and
      // exp() scales that to ~mean*5e-7 ≈ 1e-5 here
      assert(math.abs(math.exp(fits(r).null_intercept) - overall) < 1e-3,
        s"$r null intercept")
    }
  }

  test("fixed-iteration NB GLM agrees with the converged fit") {
    // the replayable (q_glm_nb_fixed) twin must land on the same optimum
    // as the early-exit fit: 8 Newton steps from the log-mean init is past
    // machine-precision convergence on well-conditioned groups
    val rows = (1 to 60).map { i =>
      val g = i % 2
      val r = s"r${i % 3}"
      (r, (if (g == 1) 30.0 else 12.0) + (i % 7), g.toDouble, 0.03 * (i % 4))
    }
    val df = rows.toDF("region", "y", "grp", "off")
    val conv = GlmNb.fitPerRegion(df, "region", "y", "grp", "off")
      .collect().map(r => r.region -> r).toMap
    val fixed = GlmNb.fitPerRegionFixed(df, "region", "y", "grp", "off", iters = 8)
      .collect().map(r => r.region -> r).toMap
    assert(fixed.keySet == conv.keySet)
    conv.foreach { case (region, c) =>
      val f = fixed(region)
      assert(math.abs(f.intercept - c.intercept) < 1e-6, s"$region intercept")
      assert(math.abs(f.log_fc - c.log_fc) < 1e-6, s"$region log_fc")
      assert(math.abs(f.lrt_stat - c.lrt_stat) < 1e-4, s"$region lrt")
      assert(math.abs(f.p_value - c.p_value) < 1e-6, s"$region p")
    }
    // determinism of the fixed form (no convergence race to hide behind)
    val again = GlmNb.fitPerRegionFixed(df, "region", "y", "grp", "off", iters = 8)
      .collect().map(r => r.region -> r).toMap
    assert(fixed.forall { case (k, v) => again(k) == v })
  }

  test("multi-covariate OLS matches the single-covariate closed form") {
    val rows = (1 to 50).map { i =>
      val x = i.toDouble
      ("g", 3.0 + 2.0 * x + (if (i % 2 == 0) 0.5 else -0.5), x, 0.0)
    }
    val df = rows.toDF("grp", "y", "x1", "x2zero")
    val multi = Models.olsMultiPerGroup(
      df.drop("x2zero"), "grp", "y", Seq("x1")).collect().head
    val single = graft.stats.Stats.olsPerGroup(df, Seq("grp"), "x1", "y")
      .select("slope", "intercept", "r2").as[(Double, Double, Double)].head()
    assert(math.abs(multi.slope - single._1) < 1e-6)
    assert(math.abs(multi.coef.head - single._2) < 1e-5)
    assert(math.abs(multi.r2 - single._3) < 1e-6)
    // adding a second covariate keeps the true slope
    val multi2 = Models.olsMultiPerGroup(
      df.withColumn("x2", col("x1") * col("x1")), "grp", "y", Seq("x1", "x2"))
      .collect().head
    assert(math.abs(multi2.slope - 2.0) < 0.1)
  }

  test("closed-form two-covariate OLS agrees with the mapGroups kernel") {
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(3, 80) { (g, i) =>
      val x1 = math.rint((10 + rng.nextGaussian() * 3) * 100) / 100
      val x2 = math.rint(rng.nextDouble() * 10) / 100
      val y = math.rint((5.0 + 2.5 * x1 - 40.0 * x2 + rng.nextGaussian()) * 100) / 100
      (s"g$g", y, x1, x2)
    }.flatten
    val df = rows.toDF("grp", "y", "x1", "x2")
    val exact = graft.stats.Stats.olsTwoCovariatesExact(
        df, Seq("grp"), "y", "x1", "x2")
      .select("grp", "b0", "b1", "b2", "t_slope", "p_slope", "r2")
      .as[(String, Double, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val kernel = Models.olsMultiPerGroup(df, "grp", "y", Seq("x1", "x2"))
      .collect().map(r => r.group -> r).toMap
    assert(exact.keySet == kernel.keySet && exact.size == 3)
    exact.foreach { case (g, e) =>
      val m = kernel(g)
      assert(math.abs(e._2 - m.coef(0)) < 1e-4, s"$g b0")
      assert(math.abs(e._3 - m.coef(1)) < 1e-4, s"$g b1")
      assert(math.abs(e._4 - m.coef(2)) < 1e-4, s"$g b2")
      assert(math.abs(e._5 - m.t_slope) < 1e-3, s"$g t")
      assert(math.abs(e._6 - m.p_slope) < 1e-4, s"$g p")
      assert(math.abs(e._7 - m.r2) < 1e-6, s"$g r2")
      assert(math.abs(e._3 - 2.5) < 0.2, s"$g recovers the planted slope")
    }
  }

  test("ComBat centers batch means toward each other") {
    val rng = new scala.util.Random(3)
    val rows = for {
      g <- 1 to 8; s <- 1 to 40
    } yield {
      val batch = if (s <= 20) "b1" else "b2"
      val shift = if (batch == "b1") 2.0 else -2.0
      (s"g$g", s"s$s", 10.0 + g + shift + rng.nextGaussian() * 0.3)
    }
    val data = rows.toDF("gene", "sample", "value")
    val batches = (1 to 40).map(s => (s"s$s", if (s <= 20) "b1" else "b2"))
      .toDF("sample", "batch")
    val adj = Combat.adjust(data, batches)
    val gaps = adj.groupBy("gene").pivot("batch").agg(avg("adjusted"))
      .select(abs(col("b1") - col("b2"))).as[Double].collect()
    val rawGap = 4.0
    assert(gaps.forall(_ < 0.5), s"post-adjust batch gaps: ${gaps.toSeq}")
    assert(gaps.forall(_ < rawGap))
  }

  test("MethylMix pipeline keeps driven genes and calls DM states") {
    import graft.pipelines.MethylMixPipeline
    // gA: bimodal methylation DRIVING expression (negative slope);
    // gB: methylation unrelated to expression -> lm filter must drop it
    val cancer = (1 to 60).map { i =>
      val metA = if (i % 2 == 0) 0.8 + 0.001 * (i % 5) else 0.2 + 0.001 * (i % 5)
      val geA = 5.0 - 4.0 * metA + 0.01 * (i % 3)
      ("gA", s"s$i", metA, geA)
    } ++ (1 to 60).map { i =>
      ("gB", s"s$i", 0.3 + 0.005 * (i % 20), (i % 11) * 1.0)
    }
    val normal = (1 to 20).map(i => ("gA", s"n$i", 0.5)) ++
      (1 to 20).map(i => ("gB", s"n$i", 0.3))
    val out = MethylMixPipeline.run(
      cancer.toDF("gene", "sample", "met", "ge"),
      normal.toDF("gene", "sample", "met")).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[String]("gene")).toSet == Set("gA"), "filter leak")
    // two components around 0.2 / 0.8 vs normal 0.5 -> one hypo, one hyper
    val states = out.map(r =>
      r.getAs[Double]("mean") -> r.getAs[String]("state")).sortBy(_._1)
    assert(states.head._2 == "hypo" && states.last._2 == "hyper",
      states.mkString(","))
    assert(out.head.getAs[Int]("n_components") == 2)
  }

  test("fixed-iteration MethylMix pipeline agrees with the converged run") {
    import graft.pipelines.MethylMixPipeline
    // same planted fixture as the converged-pipeline test: gA driven
    // (bimodal met, negative slope — |t| far beyond the twin's 10 cut),
    // gB undriven (t near 0) — both filters must make the same call,
    // and the k=2 fixed fit must land on the converged components
    val cancer = (1 to 60).map { i =>
      val metA = if (i % 2 == 0) 0.8 + 0.001 * (i % 5) else 0.2 + 0.001 * (i % 5)
      val geA = 5.0 - 4.0 * metA + 0.01 * (i % 3)
      ("gA", s"s$i", metA, geA)
    } ++ (1 to 60).map { i =>
      ("gB", s"s$i", 0.3 + 0.005 * (i % 20), (i % 11) * 1.0)
    }
    val normal = (1 to 20).map(i => ("gA", s"n$i", 0.5)) ++
      (1 to 20).map(i => ("gB", s"n$i", 0.3))
    val conv = MethylMixPipeline.run(
      cancer.toDF("gene", "sample", "met", "ge"),
      normal.toDF("gene", "sample", "met")).collect()
    val fixed = MethylMixPipeline.runFixed(
      cancer.toDF("gene", "sample", "met", "ge"),
      normal.toDF("gene", "sample", "met")).collect()
    assert(fixed.map(_.getAs[String]("gene")).toSet == Set("gA"),
      "twin filter decision differs")
    assert(fixed.length == conv.length)
    val cs = conv.sortBy(_.getAs[Double]("mean"))
    val fs = fixed.sortBy(_.getAs[Double]("mean"))
    cs.zip(fs).foreach { case (c, f) =>
      assert(math.abs(c.getAs[Double]("mean") - f.getAs[Double]("mean")) < 1e-4)
      assert(c.getAs[String]("state") == f.getAs[String]("state"))
    }
  }

  test("fixed-iteration ComBat agrees with the converged path") {
    // 2-decimal values (the replayable kernel's exact-decimal contract)
    val rng = new scala.util.Random(11)
    val rows = for { g <- 1 to 8; s <- 1 to 40 } yield {
      val batch = s"b${s % 2}"
      val shift = if (batch == "b0") 2.0 else -2.0
      (s"g$g", s.toLong,
        math.rint((10.0 + g + shift + rng.nextGaussian() * 0.3) * 100) / 100,
        batch)
    }
    val data = rows.toDF("gene", "sample", "value", "batch")
    val conv = Combat.adjustPreJoined(data)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val fixed = Combat.adjustPreJoinedFixed(data)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(fixed.keySet == conv.keySet)
    // quantization seams (z at 1e-6, moments at 1e-12) and the fixed step
    // count bound the divergence well below data scale
    conv.foreach { case (k, c) =>
      assert(math.abs(fixed(k) - c) < 1e-3, s"$k: fixed=${fixed(k)} conv=$c")
    }
    // determinism of the fixed form
    val again = Combat.adjustPreJoinedFixed(data)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(fixed.forall { case (k, v) => again(k) == v })
  }

  test("nonparametric ComBat matches a driver-side int.eprior replay and " +
    "its fixed twin stays within quantization tolerance") {
    val rng = new scala.util.Random(17)
    val rows = for { g <- 1 to 8; s <- 1 to 40 } yield {
      val batch = s"b${s % 2}"
      val shift = if (batch == "b0") 2.0 else -2.0
      (s"g$g", s.toLong,
        math.rint((10.0 + g + shift + rng.nextGaussian() * 0.3) * 100) / 100,
        batch)
    }
    val data = rows.toDF("gene", "sample", "value", "batch")
    // driver-side raw-likelihood re-derivation of int.eprior
    // (ComBat_NoFiles.R:268-289): no log-space tricks, no sufficient-stat
    // factorization — the straight per-gene Monte-Carlo integration
    val byGene = rows.groupBy(_._1)
    val alphaSigma = byGene.map { case (g, rs) =>
      val vs = rs.map(_._3)
      val m = vs.sum / vs.size
      val sd = math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (vs.size - 1))
      g -> (m, sd)
    }
    val zCell = rows.map { case (g, s, v, b) =>
      val (a, sg) = alphaSigma(g); (g, s, b, (v - a) / sg)
    }
    val cells = zCell.groupBy(r => (r._1, r._3)).map { case ((g, b), rs) =>
      val zs = rs.map(_._4)
      val gh = zs.sum / zs.size
      val dh = zs.map(z => (z - gh) * (z - gh)).sum / (zs.size - 1)
      (g, b) -> (zs, gh, dh)
    }
    val expect = zCell.map { case (g, s, b, z) =>
      val (zs, _, _) = cells((g, b))
      val partners = cells.collect {
        case ((gj, bj), (_, ghj, dhj)) if bj == b && gj != g => (ghj, dhj)
      }
      val lhs = partners.map { case (gj, dj) =>
        val sum2 = zs.map(x => (x - gj) * (x - gj)).sum
        val lh = math.pow(2 * math.Pi * dj, -zs.size / 2.0) *
          math.exp(-sum2 / (2 * dj))
        (gj, dj, lh)
      }
      val sw = lhs.map(_._3).sum
      val gs = lhs.map(t => t._1 * t._3).sum / sw
      val ds = lhs.map(t => t._2 * t._3).sum / sw
      val (a, sg) = alphaSigma(g)
      (g, s) -> (sg * (z - gs) / math.sqrt(ds) + a)
    }.toMap
    val got = Combat.adjustPreJoinedNonParam(data)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, e) =>
      assert(math.abs(got(k) - e) < 1e-5, s"$k: got=${got(k)} expect=$e")
    }
    // the fixed twin diverges only by its quantization grids
    val fixed = Combat.adjustPreJoinedNonParamFixed(data)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(fixed.keySet == expect.keySet)
    expect.foreach { case (k, e) =>
      assert(math.abs(fixed(k) - e) < 1e-3, s"$k: fixed=${fixed(k)} expect=$e")
    }
    // determinism of the fixed form
    val again = Combat.adjustPreJoinedNonParamFixed(data)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(fixed.forall { case (k, v) => again(k) == v })
  }

  test("Robinson RRPD takes the lowest-index first overlap and smooths " +
    "the direction ratio; linearity anchors to the requested state") {
    import graft.omics.Robinson
    // peak 0 overlaps bins 0 AND 1 -> must be tabled under bin 0's state
    val peaks = Seq(
      (0L, 0.0, 149.0, "up"), (1L, 100.0, 199.0, "up"),
      (2L, 100.0, 199.0, "down"), (3L, 250.0, 260.0, "up"),
      (4L, 900.0, 950.0, "down") // overlaps nothing
    ).toDF("pid", "p_start", "p_end", "cls")
    val bins = Seq(
      (0L, 0.0, 99.0, "L=1"), (1L, 100.0, 199.0, "L=2"),
      (2L, 200.0, 299.0, "L=2")
    ).toDF("bix", "b_start", "b_end", "state")
    val r = Robinson.rrpd(peaks, bins, binWidth = 100.0, "up", "down")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3),
          if (x.isNullAt(4)) None else Some(x.getDouble(4)))).toMap
    // peak 0 -> L=1 (bix 0 beats bix 1); peaks 1,2,3 -> L=2; peak 4 dropped
    assert(r.keySet == Set("L=1", "L=2"))
    // no negCls calls and no denominator smoothing: NULL, never inf
    assert(r("L=1") == ((1L, 1L, 0L, None)))
    assert(r("L=2")._1 == 3L && r("L=2")._2 == 2L && r("L=2")._3 == 1L)
    assert(math.abs(r("L=2")._4.get - 2.5) < 1e-9) // (0.5 + 2) / 1

    // linearity: two states; the anchor state's f_scaled must equal the
    // anchor scale exactly. With sam = 4*ref in L=4 and 2*ref in L=2,
    // the per-state M log2-ratios differ by exactly log2(1/2) = -1, and
    // the reference's exp-of-log2 quirk (run_ABCD-DNA.R:43, mirrored
    // verbatim) makes the scaled factor 4*exp(-1), NOT 4*2^-1
    val bc = (0 until 400).map { i =>
      val st = if (i % 2 == 0) "L=2" else "L=4"
      val ref = 50L + i % 7
      val sam = if (st == "L=4") ref * 4 else ref * 2
      (i.toLong, st, ref, sam)
    }.toDF("region", "state", "refc", "samc")
    val lin = Robinson.linearityByCn(bc, anchor = Some(("L=4", 4.0)))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(4), x.getDouble(5))).toMap
    assert(lin.keySet == Set("L=2", "L=4"))
    assert(math.abs(lin("L=4")._3 - 4.0) < 1e-6, s"anchor: ${lin("L=4")}")
    assert(math.abs(lin("L=2")._3 - 4.0 * math.exp(-1.0)) < 1e-4,
      s"L=2: ${lin("L=2")}")
  }

  test("KNN impute fills missing cells with neighbor means") {
    // three entities; e3 tracks e1 exactly, e2 is far away
    val rows = Seq(
      ("e1", "s1", Some(1.0)), ("e1", "s2", Some(2.0)), ("e1", "s3", Some(3.0)),
      ("e2", "s1", Some(100.0)), ("e2", "s2", Some(200.0)), ("e2", "s3", Some(300.0)),
      ("e3", "s1", Some(1.0)), ("e3", "s2", Some(2.0)), ("e3", "s3", None))
      .toDF("entity", "sample", "value")
    val res = Impute.knnImpute(rows, "entity", "sample", "value", k = 1,
      maxMissingRow = 0.5, maxMissingCol = 0.5)
    val filled = res.where(col("entity") === "e3" && col("sample") === "s3")
      .select("value_imputed").as[Double].head()
    assert(filled == 3.0)
  }

  test("PCA batch check flags a planted batch effect and passes a null one") {
    val rng = new scala.util.Random(5)
    def mk(shifted: Boolean) = {
      val rows = for { g <- 1 to 10; s <- 1 to 40 } yield {
        val shift = if (shifted && s <= 20) 5.0 else 0.0
        (s"g$g", s"s$s", g + shift + rng.nextGaussian() * 0.5)
      }
      rows.toDF("gene", "sample", "value")
    }
    val batches = (1 to 40).map(s => (s"s$s", if (s <= 20) "b1" else "b2"))
      .toDF("sample", "batch")
    val hit = PcaBatch.pc1BatchAnova(mk(shifted = true), batches).collect().head
    assert(hit.getAs[Double]("p_value") < 1e-6,
      s"planted batch effect not detected: $hit")
    val nul = PcaBatch.pc1BatchAnova(mk(shifted = false), batches).collect().head
    assert(nul.getAs[Double]("p_value") > 0.001, s"null case too significant: $nul")
    // F tail sanity: published 95th percentile F(2,10)=4.103
    assert(math.abs(graft.stats.Dist.fTail(4.102821015152, 2, 10) - 0.05) < 1e-6)
  }

  test("PCA batch check distributed fallback matches the driver path") {
    val rng = new scala.util.Random(9)
    val rows = for { g <- 1 to 10; s <- 1 to 30 } yield {
      val shift = if (s <= 15) 3.0 else 0.0
      (s"g$g", s"s$s", g + shift + rng.nextGaussian() * 0.4)
    }
    val data = rows.toDF("gene", "sample", "value")
    val batches = (1 to 30).map(s => (s"s$s", if (s <= 15) "b1" else "b2"))
      .toDF("sample", "batch")
    val driver = PcaBatch.pc1BatchAnova(data, batches).collect().head
    // maxDriverP below p forces the distributed Gramian × power-step loop
    val dist = PcaBatch.pc1BatchAnova(data, batches, maxDriverP = 2)
      .collect().head
    assert(dist.getLong(0) == driver.getLong(0))
    assert(dist.getLong(1) == driver.getLong(1))
    assert(math.abs(dist.getDouble(2) - driver.getDouble(2)) < 1e-6,
      s"f_stat: ${dist.getDouble(2)} vs ${driver.getDouble(2)}")
  }

  test("PCA batch check runs above the old p=1000 landmine") {
    // 1050 genes x 5 samples: the round-5 require() threw here; now the
    // distributed path must complete and produce a finite statistic
    val rows = for { g <- 1 to 1050; s <- 1 to 5 } yield {
      val shift = if (s <= 2) 1.0 else 0.0
      (s"g$g", s"s$s", (g % 7) + shift + 0.01 * ((g * 31 + s * 17) % 13))
    }
    val data = rows.toDF("gene", "sample", "value")
    val batches = (1 to 5).map(s => (s"s$s", if (s <= 2) "b1" else "b2"))
      .toDF("sample", "batch")
    val r = PcaBatch.pc1BatchAnova(data, batches, iters = 5).collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 2L)
    assert(!r.isNullAt(2) && !r.getDouble(2).isNaN)
  }

  test("distanceMatrix micros fast path matches exact path at extreme magnitudes") {
    import graft.omics.Models.ProbeObs
    // values near 5e12: each micros value fits a long, but 10-sample sums
    // would wrap 64 bits — the magnitude guard must route the whole gene
    // to the exact BigDecimal path instead of silently overflowing
    def obs(scale: Double) = (1 to 10).flatMap { s =>
      Seq(ProbeObs("g", "p1", s"s$s", s * scale),
        ProbeObs("g", "p2", s"s$s", (11 - s) * scale),
        ProbeObs("g", "p3", s"s$s", s * scale + (if (s % 2 == 0) scale / 2 else 0.0)))
    }.toArray
    val probes = Array("p1", "p2", "p3")
    val small = Models.distanceMatrix(obs(1.0), probes)
    val big = Models.distanceMatrix(obs(5e11), probes)
    // pearson is scale-invariant: distances must agree across magnitudes
    for (i <- 0 until 3; j <- 0 until 3)
      assert(math.abs(small(i)(j) - big(i)(j)) < 1e-9,
        s"($i,$j): ${small(i)(j)} vs ${big(i)(j)}")
    assert(math.abs(big(0)(1) - 2.0) < 1e-9) // perfectly anti-correlated
  }

  test("per-gene probe clustering groups correlated probes") {
    // probes p1,p2 perfectly correlated; p3 anti-correlated
    val samples = 1 to 10
    val rows = samples.flatMap { s =>
      val base = s.toDouble
      Seq(("g", "p1", s"s$s", base), ("g", "p2", s"s$s", base * 2 + 1),
        ("g", "p3", s"s$s", -base))
    }.toDF("gene", "probe", "sample", "value")
    val cl = Models.clusterProbesPerGene(rows, "gene", "probe", "sample", "value", h = 0.6)
      .collect().map(r => r.probe -> r.cluster).toMap
    assert(cl("p1") == cl("p2"))
    assert(cl("p1") != cl("p3"))
  }
}
