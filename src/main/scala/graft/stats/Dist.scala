package graft.stats

/** Statistical distribution tail/density functions needed by the engine.
  *
  * The reference relies on R's dnorm/pnorm/qnorm (DriverNet
  * getPatientOutlierMatrix.R:13-16, Gohs_method
  * integrated_aCGH_expression_relationships.R:77-86), t-distribution
  * p-values for correlations (integrative_omics/corrMultiomics.py:52-63 via
  * scipy), chi-square tails for Fisher's combined p (Gohs:130) and GLM LRTs
  * (Robinson_method/R/run_ABCD-DNA.R:66-81), and beta densities for the
  * MethylMix mixture model (MethylMix/MethylMix.R:603,719).
  *
  * Pure JVM double math (Lanczos lgamma, continued-fraction incomplete
  * beta/gamma, Abramowitz-Stegun style erf) — accurate to ~1e-12, no
  * external deps, safe to call from codegen'd expressions and executors.
  */
object Dist extends Serializable {

  /** log Gamma via Lanczos approximation (g=7, n=9). */
  def lgamma(xx: Double): Double = {
    if (xx <= 0.0 && xx == math.floor(xx)) return Double.PositiveInfinity
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (xx < 0.5) {
      // reflection
      math.log(math.Pi / math.sin(math.Pi * xx)) - lgamma(1.0 - xx)
    } else {
      val x = xx - 1.0
      var a = c(0)
      val t = x + g + 0.5
      var i = 1
      while (i < 9) { a += c(i) / (x + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** erf via Numerical-Recipes-style Chebyshev fit of erfc; |err| < 1.2e-7,
    * refined by one series fallback for small |x| to ~1e-12. */
  def erf(x: Double): Double = {
    if (x == 0.0) return 0.0
    val ax = math.abs(x)
    if (ax < 1e-8) return 2.0 * x / math.sqrt(math.Pi)
    // use regularized incomplete gamma: erf(x) = P(1/2, x^2) for x>0
    val p = gammaP(0.5, ax * ax)
    if (x > 0) p else -p
  }

  def erfc(x: Double): Double = {
    if (x >= 0) gammaQ(0.5, x * x)
    else 1.0 + gammaP(0.5, x * x)
  }

  /** Standard normal CDF. */
  def pnorm(x: Double): Double = 0.5 * erfc(-x / math.sqrt(2.0))
  def pnorm(x: Double, mean: Double, sd: Double): Double = pnorm((x - mean) / sd)
  /** Standard normal density (log option mirrors R dnorm(log=TRUE),
    * DriverNet getPatientOutlierMatrix.R:13). */
  def dnorm(x: Double): Double =
    math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.Pi)
  def dnormLog(x: Double, mean: Double, sd: Double): Double = {
    val z = (x - mean) / sd
    -0.5 * z * z - math.log(sd) - 0.5 * math.log(2.0 * math.Pi)
  }

  /** Normal quantile (Acklam's rational approximation + one Halley step). */
  def qnorm(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"qnorm: p=$p out of (0,1)")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    val x =
      if (p < pl) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      } else if (p <= 1 - pl) {
        val q = p - 0.5; val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else {
        val q = math.sqrt(-2 * math.log(1 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      }
    // one Halley refinement
    val e = pnorm(x) - p
    val u = e * math.sqrt(2 * math.Pi) * math.exp(x * x / 2.0)
    x - u / (1 + x * u / 2.0)
  }

  // ---- incomplete gamma (regularized): P(a,x), Q(a,x) ----
  private val MaxIter = 500
  private val Eps = 3e-14
  private val FpMin = 1e-300

  /** Regularized lower incomplete gamma P(a,x). */
  def gammaP(a: Double, x: Double): Double = {
    require(a > 0.0 && x >= 0.0, s"gammaP(a=$a,x=$x)")
    if (x == 0.0) 0.0
    else if (x < a + 1.0) gser(a, x)
    else 1.0 - gcf(a, x)
  }
  /** Regularized upper incomplete gamma Q(a,x). */
  def gammaQ(a: Double, x: Double): Double = {
    require(a > 0.0 && x >= 0.0, s"gammaQ(a=$a,x=$x)")
    if (x == 0.0) 1.0
    else if (x < a + 1.0) 1.0 - gser(a, x)
    else gcf(a, x)
  }
  private def gser(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var i = 0
    while (i < MaxIter && math.abs(del) >= math.abs(sum) * Eps) {
      ap += 1.0; del *= x / ap; sum += del; i += 1
    }
    sum * math.exp(-x + a * math.log(x) - lgamma(a))
  }
  private def gcf(a: Double, x: Double): Double = {
    var b = x + 1.0 - a
    var c = 1.0 / FpMin
    var d = 1.0 / b
    var h = d
    var i = 1
    var done = false
    while (i <= MaxIter && !done) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < FpMin) d = FpMin
      c = b + an / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      i += 1
    }
    h * math.exp(-x + a * math.log(x) - lgamma(a))
  }

  /** Chi-square upper-tail probability (df>0): survival fn used for the
    * Fisher combined statistic (Gohs:130) and GLM LRT p-values. */
  def chisqTail(x: Double, df: Double): Double =
    if (x <= 0) 1.0 else gammaQ(df / 2.0, x / 2.0)

  // ---- incomplete beta ----
  /** Regularized incomplete beta I_x(a,b) via continued fraction. */
  def betaInc(a: Double, b: Double, x: Double): Double = {
    require(a > 0 && b > 0, s"betaInc(a=$a,b=$b)")
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val bt = math.exp(lgamma(a + b) - lgamma(a) - lgamma(b) +
        a * math.log(x) + b * math.log(1.0 - x))
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
      else 1.0 - bt * betacf(b, a, 1.0 - x) / b
    }
  }
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= MaxIter && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c; if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      m += 1
    }
    h
  }

  /** Two-sided Student-t p-value for statistic t with df degrees of
    * freedom — the p scipy.stats.pearsonr reports
    * (corrMultiomics.py:52-63) and R cor.test's default. */
  def tTail2(t: Double, df: Double): Double = {
    if (df <= 0) return Double.NaN
    if (t.isInfinite) return 0.0
    betaInc(df / 2.0, 0.5, df / (df + t * t))
  }

  /** One-sided (alternative = "greater") Student-t tail P(T_df > t). */
  def tTailGreater(t: Double, df: Double): Double = {
    if (df <= 0) return Double.NaN
    if (t.isInfinite) return if (t > 0) 0.0 else 1.0
    val half = 0.5 * betaInc(df / 2.0, 0.5, df / (df + t * t))
    if (t >= 0) half else 1.0 - half
  }

  /** One-sided p of R's `cor.test(x, y, alternative = "g")` for Pearson
    * (or, with `controlled` > 0, partial) correlation r over n
    * observations: t = r·sqrt(df/(1−r²)) with df = n − 2 − controlled,
    * and the reference's literal-zero floor pv == 0 → 2e-16
    * (Gohs_method/integrated_aCGH_expression_relationships.R:121-124,
    * 187-190). */
  def corrPValueGreater(r: Double, n: Long, controlled: Int = 0): Double = {
    val df = (n - 2 - controlled).toDouble
    if (df <= 0) return Double.NaN
    val rc = math.max(-1.0, math.min(1.0, r))
    if (rc >= 1.0) return 2e-16
    if (rc <= -1.0) return 1.0
    val t = rc * math.sqrt(df / (1.0 - rc * rc))
    val p = tTailGreater(t, df)
    if (p == 0.0) 2e-16 else p
  }

  /** Two-sided p-value of Pearson r over n observations. */
  def corrPValue(r: Double, n: Long): Double = {
    if (n < 3) return Double.NaN
    val rc = math.max(-1.0, math.min(1.0, r))
    if (math.abs(rc) >= 1.0) return 0.0
    val df = (n - 2).toDouble
    val t = rc * math.sqrt(df / (1.0 - rc * rc))
    tTail2(t, df)
  }

  /** Beta density (MethylMix betaEst_2, MethylMix.R:633-653). */
  def dbeta(x: Double, a: Double, b: Double): Double = {
    if (x < 0 || x > 1) 0.0
    else if (x == 0.0 || x == 1.0) {
      // limits: consistent with R dbeta at the boundary for a,b > 1
      if ((x == 0.0 && a > 1) || (x == 1.0 && b > 1)) 0.0 else Double.PositiveInfinity
    } else math.exp(dbetaLog(x, a, b))
  }
  def dbetaLog(x: Double, a: Double, b: Double): Double =
    (a - 1) * math.log(x) + (b - 1) * math.log1p(-x) -
      (lgamma(a) + lgamma(b) - lgamma(a + b))

  /** F-distribution upper tail P(F > f) with d1/d2 degrees of freedom
    * (one-way ANOVA p; MethylMix Download_Preprocess.R:829-848 aov). */
  def fTail(f: Double, d1: Double, d2: Double): Double = {
    if (f.isNaN || d1 <= 0 || d2 <= 0) return Double.NaN
    if (f <= 0) return 1.0
    betaInc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))
  }

  /** Fisher's method: combined chi-square statistic and p for k p-values
    * (survcomp::combine.test analogue, Gohs:130,156,196). */
  def fisherCombined(ps: Seq[Double]): (Double, Double) = {
    val stat = -2.0 * ps.map(p => math.log(math.max(p, 1e-320))).sum
    (stat, chisqTail(stat, 2.0 * ps.size))
  }
}
