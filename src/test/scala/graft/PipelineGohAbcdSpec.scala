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
