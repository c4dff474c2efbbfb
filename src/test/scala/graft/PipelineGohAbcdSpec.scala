package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the two round-10 composed pipelines (value
  * correctness is hash-gated against DuckDB at three scale factors by
  * q_pipeline_goh / q_pipeline_abcd; these tests pin the properties a
  * refactor could silently break). */
class PipelineGohAbcdSpec extends SparkSpec {
  import spark.implicits._

  private def gohCells() = {
    // 3 datasets x 12 genes x 20 samples with a planted monotone
    // ac->ex relationship on even genes and noise genes elsewhere
    val rows = for {
      ds <- Seq("A", "B", "C"); g <- 0 until 12; s <- 0 until 20
    } yield {
      val ac = (s * 7 % 13).toDouble + g
      val ex = if (g % 2 == 0) 2.0 * ac + (s % 3) * 0.1
               else ((s * 11 + g * 5) % 17).toDouble
      val cv = (s % 5).toDouble
      (ds, g.toLong, s.toLong, ac, ex, cv)
    }
    rows.toDF("ds", "g", "sample", "ac", "ex", "cv")
  }

  test("goh: p-values are valid rationals, BH is monotone, planted " +
      "signal genes rank ahead of noise genes") {
    val out = graft.pipelines.Goh.run(gohCells(), nGenes = 12, draws = 19)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length == 12) // every gene defined in every dataset
    for ((_, f, nSig, permPv, pAdj) <- out) {
      assert(f >= 0L)
      assert(nSig >= 0L && nSig <= 3L)
      assert(permPv >= 0.05 - 1e-9 && permPv <= 1.0 + 1e-9) // k/20 grid
      assert(pAdj >= permPv - 1e-9 && pAdj <= 1.0 + 1e-9)
    }
    // BH preserves the perm_pv order: sorted by perm_pv, p_adj is
    // non-decreasing (reverse running-min property)
    val byP = out.sortBy(_._4).map(_._5)
    assert(byP.zip(byP.tail).forall { case (a, b) => a <= b + 1e-12 })
    // the planted even genes carry a real ac->ex signal: their mean
    // combined statistic must exceed the noise genes'
    val (sig, noise) = out.partition(_._1 % 2 == 0)
    assert(sig.map(_._2).sum / sig.length > noise.map(_._2).sum / noise.length)
  }

  test("corrPValueGreater matches the closed-form t tails R's " +
      "cor.test(alternative='g') computes") {
    import graft.stats.Dist
    // df = 1: T is standard Cauchy, P(T > t) = 0.5 - atan(t)/pi
    for (t <- Seq(-2.0, -0.5, 0.0, 0.3, 1.0, 4.0)) {
      val expect = 0.5 - math.atan(t) / math.Pi
      assert(math.abs(Dist.tTailGreater(t, 1.0) - expect) < 1e-12,
        s"df=1 t=$t")
    }
    // df = 2: P(T > t) = 0.5 * (1 - t / sqrt(2 + t^2))
    for (t <- Seq(-3.0, -1.0, 0.0, 0.5, 1.0, 2.5)) {
      val expect = 0.5 * (1.0 - t / math.sqrt(2.0 + t * t))
      assert(math.abs(Dist.tTailGreater(t, 2.0) - expect) < 1e-12,
        s"df=2 t=$t")
    }
    // cor.test greater with n = 4 (df = 2) collapses to (1 - r) / 2
    for (r <- Seq(-0.9, -0.3, 0.0, 0.4, 0.8)) {
      assert(math.abs(Dist.corrPValueGreater(r, 4) - (1.0 - r) / 2.0) < 1e-12,
        s"n=4 r=$r")
    }
    // one-sided complements: P(T > t) + P(T > -t) = 1
    for (df <- Seq(3.0, 10.0, 30.0); t <- Seq(0.7, 1.9)) {
      assert(math.abs(
        Dist.tTailGreater(t, df) + Dist.tTailGreater(-t, df) - 1.0) < 1e-12)
    }
    // the reference's literal-zero floor (:122-124) and df guard
    assert(Dist.corrPValueGreater(1.0, 10) == 2e-16)
    assert(Dist.corrPValueGreater(0.5, 3, controlled = 1).isNaN) // df = 0
    // controlled = 1 shifts df: n = 5 controlled 1 == df 2 closed form
    assert(math.abs(Dist.corrPValueGreater(0.4, 5, controlled = 1) -
      (1.0 - 0.4) / 2.0) < 1e-12)
  }

  test("goh parametric mode: t-tail p-values replace the empirical rank, " +
      "planted genes stay ahead, and the 0.05 sig cut applies") {
    val out = graft.pipelines.Goh.run(gohCells(), nGenes = 12, draws = 19,
      parametric = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length == 12)
    for ((_, f, nSig, permPv, pAdj) <- out) {
      assert(f >= 0L) // ln p <= 0 so -2*sum(lnm) >= 0
      assert(nSig >= 0L && nSig <= 3L)
      assert(permPv >= 0.05 - 1e-9 && permPv <= 1.0 + 1e-9)
      assert(pAdj >= permPv - 1e-9 && pAdj <= 1.0 + 1e-9)
    }
    // the planted even genes have near-perfect positive pcor: their
    // parametric t tails are tiny, so every one must count 3/3 datasets
    // significant and carry a larger Fisher statistic than every noise
    // gene (a strictly stronger separation than the empirical mode's
    // mean comparison — the t tail is not floored at 1/(draws+1))
    val (sig, noise) = out.partition(_._1 % 2 == 0)
    assert(sig.forall(_._3 == 3L), s"sig counts: ${sig.map(_._3).toSeq}")
    assert(sig.map(_._2).min > noise.map(_._2).max,
      "parametric Fisher statistics must separate planted from noise")
  }

  test("df=4 one-sided t tail: the q_goh_parametric oracle's " +
      "cancellation-free closed form equals the engine's betaInc route") {
    import graft.stats.Dist
    // P(T_4 > t) = (u^2/4)(3+u) / (2(1 + x(1+u/2))), u = 4/(4+t^2),
    // x = |t|/sqrt(4+t^2), reflected for t < 0 — the exact DuckDB
    // expression the oracle evaluates. Tight relative agreement in the
    // far tail is the load-bearing property: the ln-micro-unit Fisher
    // terms shift by 1e6 * (relative error).
    def closed(t: Double): Double = {
      val u = 4.0 / (4.0 + t * t)
      val xa = math.abs(t) / math.sqrt(4.0 + t * t)
      val pp = (u * u / 4.0) * (3.0 + u) / (2.0 * (1.0 + xa * (1.0 + u / 2.0)))
      if (t >= 0) pp else 1.0 - pp
    }
    assert(closed(0.0) == 0.5)
    for (t <- Seq(-2000.0, -150.0, -7.5, -2.0, -0.4, 0.0, 0.3, 1.0, 2.7,
        15.0, 80.0, 1414.0, 5e4)) {
      val eng = Dist.tTailGreater(t, 4.0)
      val orc = closed(t)
      val rel = math.abs(eng - orc) / math.max(math.min(eng, orc), 1e-300)
      assert(rel < 1e-10, s"t=$t eng=$eng closed=$orc rel=$rel")
    }
    // the grid pcor extremes map to finite, positive tails (no underflow
    // in the oracle's double arithmetic): pcor = ±0.999999, df = 4
    for (r <- Seq(-0.999999, 0.999999)) {
      val t = r * math.sqrt(4.0 / (1.0 - r * r))
      assert(closed(t) > 0 && closed(t) < 1)
      assert(math.abs(Dist.corrPValueGreater(r, 7, controlled = 1) -
        closed(t)) / closed(t) < 1e-10)
    }
  }

  test("goh parametric: a dataset with n = 3 samples (df = 0) is " +
      "excluded by the tightened guard instead of silently dropping its " +
      "Fisher term while still counting toward the all-datasets gate") {
    // gene 0 has only 3 samples in dataset A — empirical mode (n > 2)
    // keeps it; parametric mode (df = n - 3 = 0 -> NaN t tail) must
    // drop the (A, 0) row entirely, so gene 0 fails the __kds == M gate
    // and vanishes rather than reporting a partial combined statistic
    val rows = for {
      ds <- Seq("A", "B", "C"); g <- 0 until 6; s <- 0 until 12
      if !(ds == "A" && g == 0 && s >= 3)
    } yield {
      val ac = (s * 7 % 13).toDouble + g
      // (s*5+g) % 7 is non-monotone over s = 0..2, so the 3-sample
      // slice is NOT collinear with cv and its pcor is defined — the
      // test must exercise the df guard, not the denominator guard
      val ex = 2.0 * ((s * 5 + g) % 7) + (s % 3) * 0.1
      val cv = (s % 5).toDouble
      (ds, g.toLong, s.toLong, ac, ex, cv)
    }
    val cells = rows.toDF("ds", "g", "sample", "ac", "ex", "cv")
    val par = graft.pipelines.Goh.run(cells, nGenes = 6, draws = 19,
      parametric = true).collect()
    assert(!par.map(_.getLong(0)).contains(0L),
      "df=0 gene must drop under the parametric guard")
    assert(par.map(_.getLong(0)).toSet == (1L until 6L).toSet)
    par.foreach { r =>
      assert(!r.isNullAt(3) && !r.getDouble(3).isNaN)
      assert(!r.isNullAt(4) && !r.getDouble(4).isNaN)
    }
    // empirical mode keeps the same gene (n > 2 passes at n = 3) — the
    // guard is parametric-only, preserving the reference's :102 filter
    val emp = graft.pipelines.Goh.run(cells, nGenes = 6, draws = 19)
      .collect()
    assert(emp.map(_.getLong(0)).contains(0L))
  }

  test("goh: degenerate-variance groups yield NULL pcor (never NaN) and " +
      "take the no-evidence path — the denominator guard invariant") {
    // gene 0 in dataset A has CONSTANT ac: Spark corr returns NaN for
    // rxy AND rxz, the NaN denominator fails `when(denom > 0)`, and the
    // pcor is NULL — so the gene is dropped (not defined in every
    // dataset) rather than poisoning the empirical tails. Same algebra
    // protects the null draws.
    val rows = for {
      ds <- Seq("A", "B", "C"); g <- 0 until 6; s <- 0 until 12
    } yield {
      val ac = if (g == 0 && ds == "A") 5.0
               else (s * 7 % 13).toDouble + g
      val ex = 2.0 * ((s * 3 + g) % 11) + (s % 3) * 0.1
      val cv = (s % 5).toDouble
      (ds, g.toLong, s.toLong, ac, ex, cv)
    }
    val out = graft.pipelines.Goh.run(
      rows.toDF("ds", "g", "sample", "ac", "ex", "cv"),
      nGenes = 6, draws = 19).collect()
    val genes = out.map(_.getLong(0)).toSet
    assert(!genes.contains(0L), "degenerate gene must drop, not poison")
    assert(genes == (1L until 6L).toSet)
    out.foreach { r =>
      assert(!r.isNullAt(3) && !r.getDouble(3).isNaN)
      assert(!r.isNullAt(4) && !r.getDouble(4).isNaN)
    }
  }

  test("feber: both methods report, the ww NA drop shrinks the adjusted " +
      "fit's bin set, classes are populated, and the AUC is a rank-sum " +
      "rational in [0,1]") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val out = graft.pipelines.Feber.run(li, part)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("naive", "cnadj"))
    val (nN, pN, gN, aN) = out("naive")
    val (nA, pA, gA, aA) = out("cnadj")
    // default geometry leaves the 25·500..100·150 bin tail CN-less: the
    // adjusted fit must cover strictly fewer bins (the reference's
    // rowSums(is.na(o)) == 0 drop), the naive fit all labeled bins
    assert(nA < nN, s"ww drop: $nA must be < $nN")
    for ((n, p, g, a) <- Seq(out("naive"), out("cnadj"))) {
      assert(p > 0 && g > 0 && p + g == n)
      assert(a >= 0.0 && a <= 1.0)
    }
  }

  test("abcd: every bin gets a CN in 1..4, the AUC is a single value " +
      "in [0,1], and the score sign follows log_fc") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val out = graft.pipelines.Abcd.run(li, part).collect()
    assert(out.length == 100)
    val aucs = out.map(_.getDouble(8)).distinct
    assert(aucs.length == 1 && aucs(0) >= 0.0 && aucs(0) <= 1.0)
    out.foreach { r =>
      val cn = r.getLong(1)
      assert(cn >= 1L && cn <= 4L)
      val logFc = r.getDouble(4); val score = r.getDouble(6)
      assert(math.signum(score) == math.signum(logFc) || score == 0.0)
    }
  }
}
