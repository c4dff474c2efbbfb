package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.stats.Dist

/** Distribution numerics vs published table values (normal/t/chi-square
  * quantiles are textbook constants to 12+ digits). */
class DistSpec extends AnyFunSuite {
  private val tol = 1e-9

  test("lgamma matches known values") {
    assert(math.abs(Dist.lgamma(0.5) - 0.5723649429247001) < tol)
    assert(math.abs(Dist.lgamma(5.0) - math.log(24.0)) < tol)
    assert(math.abs(Dist.lgamma(1.0)) < tol)
    assert(math.abs(Dist.lgamma(10.5) - 13.940625219403763) < 1e-8)
  }

  test("erf/pnorm match published normal CDF values") {
    assert(math.abs(Dist.erf(1.0) - 0.8427007929497149) < tol)
    assert(math.abs(Dist.pnorm(1.96) - 0.9750021048517795) < tol)
    assert(math.abs(Dist.pnorm(0.0) - 0.5) < tol)
    assert(math.abs(Dist.pnorm(-1.0) - (1 - 0.8413447460685429)) < tol)
    assert(math.abs(Dist.pnorm(1.0, 0.0, 1.0) - 0.8413447460685429) < tol)
  }

  test("qnorm inverts pnorm and matches the 97.5% quantile") {
    assert(math.abs(Dist.qnorm(0.975) - 1.9599639845400545) < 1e-10)
    assert(math.abs(Dist.qnorm(0.025) + 1.9599639845400545) < 1e-10)
    for (p <- Seq(1e-10, 0.001, 0.1, 0.5, 0.9, 0.999, 1 - 1e-10))
      assert(math.abs(Dist.pnorm(Dist.qnorm(p)) - p) < 1e-12,
        s"round trip failed at p=$p")
  }

  test("chi-square tail hits the 95th-percentile constants") {
    assert(math.abs(Dist.chisqTail(3.841458820694124, 1) - 0.05) < 1e-10)
    assert(math.abs(Dist.chisqTail(5.991464547107979, 2) - 0.05) < 1e-10)
    assert(math.abs(Dist.chisqTail(0.0, 3) - 1.0) < tol)
  }

  test("two-sided t tail hits the 97.5% quantile constants") {
    assert(math.abs(Dist.tTail2(2.2281388519862735, 10) - 0.05) < 1e-10)
    // df=1 is Cauchy: P(|T|>1) = 0.5
    assert(math.abs(Dist.tTail2(1.0, 1) - 0.5) < 1e-10)
    assert(math.abs(Dist.tTail2(0.0, 5) - 1.0) < tol)
  }

  test("corrPValue consistent with the t transform") {
    val t = 2.2281388519862735; val df = 10.0
    val r = t / math.sqrt(t * t + df)
    assert(math.abs(Dist.corrPValue(r, 12) - 0.05) < 1e-9)
    assert(Dist.corrPValue(0.999999999, 100) < 1e-12)
  }

  test("beta density and incomplete beta") {
    assert(math.abs(Dist.dbeta(0.5, 2, 2) - 1.5) < tol)
    assert(math.abs(Dist.dbeta(0.3, 2, 5) - 2.1609) < 1e-9)
    assert(math.abs(Dist.betaInc(2, 2, 0.5) - 0.5) < tol)
    assert(math.abs(Dist.betaInc(1, 1, 0.37) - 0.37) < tol)
    assert(Dist.dbeta(-0.1, 2, 2) == 0.0 && Dist.dbeta(1.1, 2, 2) == 0.0)
  }

  test("fisherCombined of uniform ps") {
    val (stat, p) = Dist.fisherCombined(Seq(0.05, 0.1))
    assert(math.abs(stat - (-2 * (math.log(0.05) + math.log(0.1)))) < tol)
    assert(p > 0 && p < 0.05)
  }

  test("dnormLog matches direct computation") {
    assert(math.abs(Dist.dnormLog(1.0, 0.0, 1.0) -
      math.log(Dist.dnorm(1.0))) < tol)
    assert(math.abs(Dist.dnormLog(3.0, 1.0, 2.0) -
      math.log(Dist.dnorm(1.0) / 2.0)) < tol)
  }
}
