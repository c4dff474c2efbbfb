package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.omics.BetaMixture
import graft.stats.Stats

/** The MethylMix lifecycle composed end to end (MethylMix.R:101-150):
  * per-gene linear-regression FILTER (keep genes whose expression is
  * transcriptionally driven by methylation: negative slope, small p,
  * non-trivial R² — MethylMix_ModelGeneExpression, MethylMix.R:187-209),
  * then the beta-mixture EM + BIC fit on the functional genes'
  * methylation (MethylMix_MixtureModel, MethylMix.R:234-290), then
  * differential-methylation values of each mixture component against the
  * normal cohort's mean (MethylMix.R:271-280).
  *
  * Spark shape: the filter is ONE algebraic aggregate (closed-form OLS
  * moments, map-side partials); its survivors feed the mapGroups EM via a
  * broadcast-sized semi join (the gene list is filter output — small);
  * the normal means are one more aggregate. Nothing here adds a kernel —
  * this is the composition layer over olsPerGroup / fitPerGene /
  * dmValues, the same way the reference's MethylMix() wraps its three
  * stages.
  *
  * @param cancer    long-form cancer cohort: (gene, sample, met, ge) —
  *                  met in (0,1), ge any scale
  * @param normalMet long-form normal cohort: (gene, sample, met)
  * @return one row per (functional gene, mixture component):
  *         gene, n_components, comp, a, b, weight, mean, log_lik, bic,
  *         normal_mean, dm, state (hyper/hypo/neutral)
  */
object MethylMixPipeline {

  def run(cancer: DataFrame, normalMet: DataFrame,
          slopeMax: Double = 0.0, pMax: Double = 1e-3, r2Min: Double = 0.1,
          dmThreshold: Double = 0.1): DataFrame = {
    val functional = Stats.olsPerGroup(cancer, Seq("gene"), "met", "ge")
      .where(col("slope") < slopeMax && col("p_slope") < pMax &&
        col("r2") > r2Min)
      .select("gene")
    val fits = BetaMixture.fitPerGene(
      cancer.join(broadcast(functional), Seq("gene"), "left_semi"),
      "gene", "met").toDF()
    val normals = normalMet.groupBy("gene")
      // exact decimal mean, NOT avg(double): a double avg is float-sum
      // order-dependent, and DuckDB's parallel aggregation order varies
      // run to run — one gene's normal_mean sat exactly on the 6-decimal
      // rounding boundary (0.4796875) and flipped between sweeps.
      // DECIMAL(38,18) represents these <=17-sig-digit met doubles
      // exactly, so the sum is order-independent in both engines.
      .agg((sum(col("met").cast("decimal(38,18)")).cast("double") /
        count(lit(1))).as("normal_mean"))
    BetaMixture.dmValues(fits, normals, dmThreshold)
  }

  /** Fixed-iteration, hash-verifiable twin of [[run]] (the
    * q_glm_nb_fixed / q_combat_fixed / q_beta_mixture_fixed recipe): the
    * functional filter thresholds the t-STATISTIC directly (|t| > tMin
    * with the negative-slope sign, so the decision is replayable in SQL —
    * DuckDB has no t tail; the tail lookup itself is Dist-golden-tested),
    * and the mixture stage is [[BetaMixture.fitPerGeneFixed]] (fixed k,
    * exactly `iters` EM steps — shares every kernel line with the
    * converged path). The filter/EM/DM machinery this exercises is
    * byte-for-byte the machinery [[run]] composes; only the two
    * data-dependent exits (p-value threshold, EM convergence/BIC) are
    * pinned. */
  def runFixed(cancer: DataFrame, normalMet: DataFrame,
               slopeMax: Double = 0.0, tMin: Double = 10.0, r2Min: Double = 0.1,
               dmThreshold: Double = 0.1, k: Int = 2, iters: Int = 10): DataFrame = {
    val functional = Stats.olsPerGroup(cancer, Seq("gene"), "met", "ge")
      .where(col("slope") < slopeMax && col("t_slope") < -tMin &&
        col("r2") > r2Min)
      .select("gene")
    val fits = BetaMixture.fitPerGeneFixed(
      cancer.join(broadcast(functional), Seq("gene"), "left_semi"),
      "gene", "met", k = k, iters = iters)
    val normals = normalMet.groupBy("gene")
      // exact decimal mean, NOT avg(double): a double avg is float-sum
      // order-dependent, and DuckDB's parallel aggregation order varies
      // run to run — one gene's normal_mean sat exactly on the 6-decimal
      // rounding boundary (0.4796875) and flipped between sweeps.
      // DECIMAL(38,18) represents these <=17-sig-digit met doubles
      // exactly, so the sum is order-independent in both engines.
      .agg((sum(col("met").cast("decimal(38,18)")).cast("double") /
        count(lit(1))).as("normal_mean"))
    BetaMixture.dmValues(fits, normals, dmThreshold)
  }
}
