package graft.queries

import org.apache.spark.sql.functions._
import graft.omics.{BetaMixture, Combat, DriverNet, GlmNb, Impute, Models, Robinson}
import graft.stats.Stats
import Q.{Entry, t}

/** Per-group model kernels (SURVEY §2.4's non-algebraic rows) wired over
  * the driver tables. These are not SQL-expressible, so the entries are
  * rows-only for the driver; each kernel carries a golden ScalaTest
  * (OmicsKernelSpec) against hand-computed / published values instead. */
object OmicsQueries {

  /** Shared fixture: per-(user,type) mean values with 20% of 'error' cells
    * nulled as synthetic missingness. The mean is sum(decimal)/count —
    * events.value is 2-decimal, so the sum is exact and order-independent
    * and the rounded cell value is bit-identical across engines (a native
    * avg() is summation-order dependent AND Spark/DuckDB round() disagree
    * on binary-double ties; see Q.scala's parity rules). */
  private def knnCells(s: org.apache.spark.sql.SparkSession, d: String) =
    Q.events(s, d).groupBy("user_id", "event_type")
      .agg(round(Q.sumDec(col("value")) / count(lit(1)), 6).as("v"))
      .withColumn("v", when(col("event_type") === "error" &&
        col("user_id") % 5 === 0, lit(null)).otherwise(col("v")))

  // sample id is the NUMERIC (orderkey*10 + linenumber) key, and batch is
  // a pure function of it (so the sample→batch map is 1:1 even though the
  // fixture reuses (orderkey, linenumber) across rows). Long join keys
  // keep the sample-axis shuffles (standardize join, final adjust join)
  // off wide strings: the 4-part concat-string key cost q_combat ~40% of
  // its round-2 wall time
  // shared q_glm_nb / q_glm_nb_fixed fixture: counts = l_quantity,
  // binary condition = linestatus, offset = log copy-number surrogate
  private def glmNbData(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "lineitem")
      .withColumn("region", (col("l_partkey") % 100).cast("string"))
      .withColumn("grp", when(col("l_linestatus") === "O", 1.0).otherwise(0.0))
      .withColumn("off", log(lit(1.0) + col("l_tax")))

  private def combatData(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "lineitem").select(
      (col("l_partkey") % 50).cast("string").as("gene"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("sample"),
      col("l_extendedprice").as("value"))

  val entries: Seq[Entry] = Seq(

    Entry("q_drivernet_greedy",
      // greedy set cover over a bipartite event graph built from events:
      // mutated genes = click/error/signup event types per user; outlier
      // genes = view/purchase; influence = a small fixed rule table
      (s, d) => {
        import s.implicits._
        val ev = Q.events(s, d)
        val mutations = ev.where(col("event_type").isin("click", "error", "signup"))
          .select(col("user_id").cast("string").as("patient"),
            col("event_type").as("gene")).distinct()
        val outliers = ev.where(col("event_type").isin("view", "purchase"))
          .select(col("user_id").cast("string").as("patient"),
            col("event_type").as("gene")).distinct()
        // no gene influences everything, so the greedy loop must take
        // several picks (signup→both made one pick cover the whole graph)
        val influence = Seq(("click", "view"), ("error", "purchase"),
          ("signup", "view")).toDF("gene_a", "gene_b")
        val cov = DriverNet.coverage(mutations, outliers, influence)
        DriverNet.greedyDrivers(cov, maxDrivers = 3)
      },
      // the greedy loop unrolled to its maxDrivers=3 depth (same pattern as
      // the herald oracle): pick argmax (count desc, gene asc), delete
      // covered (patient, outlier) events, repeat; a rank-k row exists only
      // if iteration k still had coverage, matching the loop's early stop
      Some("""WITH mut AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS patient, event_type AS gene FROM events WHERE event_type IN ('click','error','signup')), outl AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS patient, event_type AS gene FROM events WHERE event_type IN ('view','purchase')), inf AS (SELECT * FROM (VALUES ('click','view'),('error','purchase'),('signup','view')) i(ga, gb)), cov AS (SELECT DISTINCT m.gene AS dg, m.patient AS patient, i.gb AS og FROM mut m JOIN inf i ON m.gene = i.ga JOIN outl o ON o.patient = m.patient AND o.gene = i.gb), p1 AS (SELECT dg, count(*) AS n FROM cov GROUP BY 1 ORDER BY n DESC, dg LIMIT 1), r2 AS (SELECT c.* FROM cov c WHERE NOT EXISTS (SELECT 1 FROM cov x, p1 WHERE x.dg = p1.dg AND x.patient = c.patient AND x.og = c.og)), p2 AS (SELECT dg, count(*) AS n FROM r2 GROUP BY 1 ORDER BY n DESC, dg LIMIT 1), r3 AS (SELECT c.* FROM r2 c WHERE NOT EXISTS (SELECT 1 FROM r2 x, p2 WHERE x.dg = p2.dg AND x.patient = c.patient AND x.og = c.og)), p3 AS (SELECT dg, count(*) AS n FROM r3 GROUP BY 1 ORDER BY n DESC, dg LIMIT 1) SELECT CAST(rank AS INTEGER) AS rank, driver_gene, events_covered FROM (SELECT 1 AS rank, dg AS driver_gene, n AS events_covered FROM p1 UNION ALL SELECT 2, dg, n FROM p2 UNION ALL SELECT 3, dg, n FROM p3)""")),

    Entry("q_drivernet_permutation",
      (s, d) => {
        import s.implicits._
        val ev = Q.events(s, d)
        val mutations = ev.where(col("event_type").isin("click", "error"))
          .select(col("user_id").cast("string").as("patient"),
            col("event_type").as("gene")).distinct()
        val outliers = ev.where(col("event_type").isin("view", "purchase"))
          .select(col("user_id").cast("string").as("patient"),
            col("event_type").as("gene")).distinct()
        val influence = Seq(("click", "view"), ("error", "purchase"))
          .toDF("gene_a", "gene_b")
        DriverNet.permutedTopCovers(mutations, outliers, influence, nPerm = 5)
      },
      // the md5-derived permutation is replayed exactly: slot genes by
      // (md5 key, patient, gene), slot rows by (patient, gene), pair on
      // slot, rebuild coverage, take the top cover per perm (0 if none)
      Some("""WITH mut AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS patient, event_type AS gene FROM events WHERE event_type IN ('click','error')), outl AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS patient, event_type AS gene FROM events WHERE event_type IN ('view','purchase')), inf AS (SELECT * FROM (VALUES ('click','view'),('error','purchase')) i(ga, gb)), perms AS (SELECT CAST(i AS INTEGER) AS perm FROM generate_series(0, 4) g(i)), keyed AS (SELECT p.perm, m.patient, m.gene, md5(concat('perm42:', CAST(p.perm AS VARCHAR), ':', m.patient, ':', m.gene)) AS k FROM mut m CROSS JOIN perms p), slotted AS (SELECT perm, patient, gene, row_number() OVER (PARTITION BY perm ORDER BY k, patient, gene) AS gslot, row_number() OVER (PARTITION BY perm ORDER BY patient, gene) AS rslot FROM keyed), pm AS (SELECT g.perm, r.patient, g.gene FROM (SELECT perm, gslot AS slot, gene FROM slotted) g JOIN (SELECT perm, rslot AS slot, patient FROM slotted) r ON g.perm = r.perm AND g.slot = r.slot), cov AS (SELECT DISTINCT pm.perm, pm.gene AS dg, pm.patient, i.gb AS og FROM pm JOIN inf i ON pm.gene = i.ga JOIN outl o ON o.patient = pm.patient AND o.gene = i.gb), tops AS (SELECT perm, max(n) AS top_cover FROM (SELECT perm, dg, count(*) AS n FROM cov GROUP BY 1, 2) GROUP BY 1) SELECT p.perm, coalesce(t.top_cover, 0) AS top_cover FROM perms p LEFT JOIN tops t ON p.perm = t.perm""")),

    Entry("q_beta_mixture",
      // MethylMix beta-mixture EM + BIC per group on discount mapped into
      // (0,1); deterministic init/iteration -> stable output
      // gene = partkey bucket: hundreds of small per-gene fits fanned out
      // across cores — the MethylMix shape (thousands of genes × hundreds
      // of samples), not a handful of giant groups
      (s, d) => BetaMixture.fitPerGene(
        t(s, d, "lineitem").select(
          (col("l_partkey") % 500).cast("string").as("gene"),
          ((col("l_discount") + 0.005) / 0.12).as("value")),
        "gene", "value").toDF(),
      // fixed-point-residual certificate (see ResidualOracles): DuckDB
      // reads the claimed converged fit back, checks the log-lik at those
      // parameters, one EM step's stationarity, BIC and the gene universe
      Some(ResidualOracles.betaMixture("q_beta_mixture"))),

    Entry("q_beta_mixture_fixed",
      // the hash-verified twin of q_beta_mixture (same recipe as
      // q_glm_nb_fixed / q_combat_fixed): fixed k=2 and exactly 10 EM
      // steps, so the fit is a closed-form recurrence over the per-gene
      // (distinct value, count) histogram — l_discount's 11-point grid —
      // that the oracle unrolls: deterministic quantile-split init, then
      // per step one row-level E CTE (log-space responsibilities, -700
      // exp floor) and one aggregate M CTE (weighted method-of-moments).
      // exp/ln/lgamma differ across engines only at ulp scale and EM is
      // contractive, so 6-decimal parameter / 3-decimal likelihood
      // rounding absorbs the drift (the q_glm_nb_fixed precedent).
      (s, d) => BetaMixture.fitPerGeneFixed(
          t(s, d, "lineitem").select(
            (col("l_partkey") % 500).cast("string").as("gene"),
            ((col("l_discount") + 0.005) / 0.12).as("value")),
          "gene", "value", k = 2, iters = 10)
        .select(col("gene"), col("n_components"), col("comp"),
          round(col("a"), 6).as("a"), round(col("b"), 6).as("b"),
          round(col("weight"), 6).as("weight"), round(col("mean"), 6).as("mean"),
          round(col("log_lik"), 3).as("log_lik"), round(col("bic"), 3).as("bic")),
      Some(betaMixtureFixedOracleSql(iters = 10))),

    Entry("q_glm_nb",
      // ABCD-DNA NB-GLM with offsets per region; counts = l_quantity,
      // condition = linestatus, offset = log copy-number surrogate
      (s, d) => GlmNb.fitPerRegion(glmNbData(s, d),
        "region", "l_quantity", "grp", "off").toDF(),
      // fixed-point-residual certificate: one IRLS step from the claimed
      // full/null coefficients must return to them, the LRT must match
      // the NB log-lik difference at those coefficients (lgamma in SQL)
      Some(ResidualOracles.glmNb("q_glm_nb"))),

    Entry("q_glm_nb_fixed",
      // the hash-verified twin of q_glm_nb: exactly 8 IRLS steps for both
      // models (no convergence exit), so the whole fit is a closed-form
      // recurrence the oracle unrolls into MATERIALIZED CTEs (the
      // q_hclust_probes / q_pca_batch pattern). p/z stay kernel-side
      // (chi-square(1) tail = erf, which DuckDB lacks; Dist goldens cover
      // it) — the gate compares region, n, both coefficients and the LRT
      // statistic, i.e. everything upstream of the tail lookup.
      (s, d) => GlmNb.fitPerRegionFixed(glmNbData(s, d),
          "region", "l_quantity", "grp", "off", dispersion = 0.1, iters = 8)
        .select(col("region"), col("n"), round(col("intercept"), 6).as("intercept"),
          round(col("log_fc"), 6).as("log_fc"), round(col("lrt_stat"), 4).as("lrt_stat")),
      Some(glmNbOracleSql(iters = 8))),

    Entry("q_ols_covariate",
      // MethylMix covariate branch y ~ x1 + x2 per group — the closed-form
      // exact-decimal aggregate (map-side partials + Cramer solve in the
      // projection; bit-reproducible, so fully DuckDB-oracled). The
      // general-k mapGroups kernel (Models.olsMultiPerGroup) remains the
      // library path for >2 covariates and is golden-tested against this
      // on the same data in OmicsKernelSpec.
      (s, d) => Stats.olsTwoCovariatesExact(t(s, d, "lineitem"),
          Seq("l_returnflag"), "l_extendedprice", "l_quantity", "l_discount")
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          Q.r6(col("b0")).as("b0"), Q.r6(col("b1")).as("b1"),
          Q.r6(col("b2")).as("b2"), Q.r6(col("t_slope")).as("t_slope"),
          Q.r6(col("r2")).as("r2")),
      Some("""WITH g AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s1, CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s2, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s11, CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s22, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s12, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s1y, CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s2y, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL AND l_discount IS NOT NULL GROUP BY 1), k AS (SELECT *, n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2) AS det FROM g), c AS (SELECT l_returnflag, n, sy, s1y, s2y, syy, det, (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)) / nullif(det, 0) AS b0, (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)) / nullif(det, 0) AS b1, (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)) / nullif(det, 0) AS b2, n * s22 - s2 * s2 AS c11 FROM k), f AS (SELECT l_returnflag, n, b0, b1, b2, greatest(syy - b0 * sy - b1 * s1y - b2 * s2y, 0.0) AS rss, syy - sy * sy / n AS tss, det, c11 FROM c) SELECT l_returnflag, CAST(n AS BIGINT) AS n, CAST(round(CAST(CAST(b0 AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS b0, CAST(round(CAST(CAST(b1 AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS b1, CAST(round(CAST(CAST(b2 AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS b2, CAST(round(CAST(CAST(b1 / nullif(sqrt(rss / (n - 3) * c11 / nullif(det, 0)), 0) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS t_slope, CAST(round(CAST(CAST(1.0 - rss / (CASE WHEN tss > 0 THEN tss END) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS r2 FROM f""")),

    Entry("q_combat",
      // ComBat EB batch adjustment on a long-form slice; batch is a pure
      // function of the sample key, so the pre-joined path applies — no
      // distinct + sample-axis join just to attach a derivable label
      // (Combat.adjust(data, batches) remains the map-input API)
      (s, d) => Combat.adjustPreJoined(combatData(s, d)
        .withColumn("batch", concat(lit("b"), (col("sample") % 3).cast("string")))),
      // fixed-point-residual certificate: claimed per-cell EB params must
      // be one-EB-step stationary against DuckDB's own moments/priors,
      // and each adjusted value must match the affine transform they imply
      Some(ResidualOracles.combat("q_combat"))),

    Entry("q_combat_fixed",
      // the hash-verified twin of q_combat (same recipe as q_glm_nb_fixed):
      // exact decimal raw sums make alpha/sigma/moments/priors
      // order-independent — hence bit-identical across engines — and the
      // EB fixed point runs exactly 40 steps, unrolled in the oracle as 40
      // scalar CTEs over the 150-row (gene,batch) grid. Rounding seams:
      // the O(1)-magnitude intermediates (z at 6, moments at 12) use the
      // varchar-decimal mimic (sound there — ulp << the decimal grid);
      // the final adjusted rides the 1e5 value magnitude where ulp beats
      // the grid, so it uses the string-free floor(x*1e6+0.5)/1e6
      // quantizer instead (identical IEEE ops on both engines).
      (s, d) => Combat.adjustPreJoinedFixed(combatData(s, d)
        .withColumn("batch", concat(lit("b"), (col("sample") % 3).cast("string")))),
      Some(combatFixedOracleSql(iters = 40))),

    Entry("q_combat_nonparam",
      // the reference's par.prior=FALSE route (int.eprior Monte-Carlo
      // integration): each gene's batch effects are the likelihood-
      // weighted average of every OTHER gene's raw estimates in the
      // batch. The hash-verified fixed twin — the sufficient-stat
      // factorization turns the integration into a within-batch
      // gene×gene join of dim-sized relations, weights are log-space
      // q6-quantized then micro-unit LONGs, sums exact decimals; the
      // oracle replays it closed-form (no unroll)
      (s, d) => Combat.adjustPreJoinedNonParamFixed(combatData(s, d)
        .withColumn("batch", concat(lit("b"), (col("sample") % 3).cast("string")))),
      Some(combatNonParamOracleSql)),

    Entry("q_rrpd",
      // Robinson Figure-4 relative-peak-density curve: called regions →
      // first-overlap CN state (lowest bin index, the GRanges
      // select="first" convention) → (state × direction) contingency →
      // smoothed gain/loss ratio per state
      (s, d) => {
        val peaks = t(s, d, "lineitem")
          .groupBy((col("l_orderkey") % 200).as("pid"))
          .agg((sum(col("l_quantity").cast("long")) % 2).as("par"))
          .select(col("pid"),
            (col("pid") * 77).cast("double").as("p_start"),
            (col("pid") * 77 + 76).cast("double").as("p_end"),
            when(col("par") === 0, "up").otherwise("down").as("cls"))
        val bins = t(s, d, "part")
          .groupBy((col("p_partkey") % 30).as("bix"))
          .agg((lit(1) + sum(col("p_size")).cast("long") % 4).as("cn"))
          .select(col("bix"),
            (col("bix") * 500).cast("double").as("b_start"),
            (col("bix") * 500 + 499).cast("double").as("b_end"),
            concat(lit("L="), col("cn").cast("string")).as("state"))
        Robinson.rrpd(peaks, bins, binWidth = 500.0,
          posCls = "up", negCls = "down")
      },
      Some("""WITH peaks AS (SELECT pid, CAST(pid * 77 AS DOUBLE) AS p_start, CAST(pid * 77 + 76 AS DOUBLE) AS p_end, CASE WHEN par = 0 THEN 'up' ELSE 'down' END AS cls FROM (SELECT l_orderkey % 200 AS pid, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) % 2 AS par FROM lineitem GROUP BY 1)), bins AS (SELECT bix, CAST(bix * 500 AS DOUBLE) AS b_start, CAST(bix * 500 + 499 AS DOUBLE) AS b_end, concat('L=', CAST(1 + cnr AS VARCHAR)) AS state FROM (SELECT p_partkey % 30 AS bix, CAST(sum(p_size) AS BIGINT) % 4 AS cnr FROM part GROUP BY 1)), hit AS (SELECT p.pid, p.cls, min_by(b.state, b.bix) AS state FROM peaks p JOIN bins b ON p.p_start <= b.b_end AND b.b_start <= p.p_end GROUP BY 1, 2), ct AS (SELECT state, CAST(count(*) AS BIGINT) AS n_peaks, CAST(sum(CASE WHEN cls = 'up' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, CAST(sum(CASE WHEN cls = 'down' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg FROM hit GROUP BY 1) SELECT state, n_peaks, n_pos, n_neg, CASE WHEN CAST(0.0 AS DOUBLE) + CAST(n_neg AS DOUBLE) > 0 THEN floor((CAST(0.5 AS DOUBLE) + CAST(n_pos AS DOUBLE)) / (CAST(0.0 AS DOUBLE) + CAST(n_neg AS DOUBLE)) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE) END AS rrpd FROM ct""")),

    Entry("q_linearity_cn",
      // Robinson Figure-2 linearity: per CN state, median M log-ratio
      // over the state's high-abundance bins (top max(100, ~1%) by A,
      // with the zero-count edge-point guard), exp'd and rescaled to
      // the L=4 anchor — the observed-fold-change-tracks-copy-number
      // check
      (s, d) => {
        val bc = t(s, d, "lineitem")
          .groupBy((col("l_partkey") % 100).as("region"))
          .agg(
            coalesce(sum(when(col("l_linestatus") === "O",
              col("l_quantity").cast("long"))), lit(0L)).as("refc"),
            coalesce(sum(when(col("l_linestatus") === "F",
              col("l_quantity").cast("long"))), lit(0L)).as("samc"))
          .withColumn("state",
            concat(lit("L="), (lit(1) + col("region") % 4).cast("string")))
        Robinson.linearityByCn(bc, anchor = Some(("L=4", 4.0)))
      },
      Some {
        def q(x: String) =
          s"floor(($x) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE)"
        s"""WITH bc AS (SELECT region, concat('L=', CAST(1 + region % 4 AS VARCHAR)) AS state, refc, samc FROM (SELECT l_partkey % 100 AS region, CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END), 0) AS BIGINT) AS refc, CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END), 0) AS BIGINT) AS samc FROM lineitem GROUP BY 1)), tot AS (SELECT CAST(sum(refc) AS DOUBLE) AS s2, CAST(sum(samc) AS DOUBLE) AS s3 FROM bc), ma AS (SELECT region, state, (refc = 0 OR samc = 0) AS w, ${q("(log2(greatest(CAST(refc AS DOUBLE), CAST(0.5 AS DOUBLE)) / t.s2) + log2(greatest(CAST(samc AS DOUBLE), CAST(0.5 AS DOUBLE)) / t.s3)) / CAST(2.0 AS DOUBLE)")} AS a, CASE WHEN NOT (refc = 0 OR samc = 0) THEN ${q("log2((CAST(samc AS DOUBLE) / t.s3) / (CAST(refc AS DOUBLE) / t.s2))")} END AS m FROM bc, tot t), nw AS (SELECT state, count(*) AS n_nw, least(greatest(100, CAST(floor(CAST(count(*) AS DOUBLE) * CAST(0.01 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)), count(*)) AS top FROM ma WHERE NOT w GROUP BY 1), qa AS (SELECT state, a AS qa FROM (SELECT ma.state, ma.a, row_number() OVER (PARTITION BY ma.state ORDER BY ma.a DESC, ma.region) AS rn, nw.top FROM ma JOIN nw USING (state) WHERE NOT ma.w) WHERE rn = top), qw AS (SELECT state, max(a) AS qw FROM ma WHERE w GROUP BY 1), cuts AS (SELECT qa.state, greatest(qa.qa, coalesce(qw.qw, CAST('-infinity' AS DOUBLE))) AS qv FROM qa LEFT JOIN qw USING (state)), f AS (SELECT ma.state, CAST(count(*) AS BIGINT) AS n_kept, ${q("quantile_cont(ma.m, 0.5)")} AS f_log2 FROM ma JOIN cuts USING (state) WHERE NOT ma.w AND ma.a > cuts.qv GROUP BY 1), f2 AS (SELECT state, n_kept, f_log2, ${q("exp(f_log2)")} AS f FROM f), nall AS (SELECT state, CAST(count(*) AS BIGINT) AS n_bins FROM ma GROUP BY 1), base AS (SELECT nall.state, nall.n_bins, f2.n_kept, f2.f_log2, f2.f FROM nall LEFT JOIN f2 USING (state)), fa AS (SELECT max(CASE WHEN state = 'L=4' THEN f END) AS fav FROM base) SELECT state, n_bins, n_kept, f_log2, f, ${q("f / fa.fav * CAST(4.0 AS DOUBLE)")} AS f_scaled FROM base, fa"""
      }),

    Entry("q_knn_impute",
      // KNN imputation: per-user per-type mean values with 20% of the
      // 'error' cells knocked out (NOT the whole column — a fully-missing
      // column is dropped by the maxMissingCol filter and nothing would
      // ever be imputed)
      (s, d) => {
        Impute.knnImpute(knnCells(s, d), "user_id", "event_type", "v", k = 5)
      },
      // full impute.knn replay: row/col missing filters, needy->donor
      // distances over shared samples, top-5 by (round(dist,6), donor) —
      // the same tie-safe ordering the engine uses — then the donor mean.
      // round mimics use the documented decimal-cast form (Q.scala).
      Some("""WITH cells AS (SELECT user_id AS entity, event_type AS sample, CASE WHEN event_type = 'error' AND user_id % 5 = 0 THEN NULL ELSE CAST(round(CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) END AS v FROM events GROUP BY 1, 2), rowok AS (SELECT entity FROM cells GROUP BY 1 HAVING CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) <= 0.2), colok AS (SELECT sample FROM cells GROUP BY 1 HAVING CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) <= 0.2), kept AS (SELECT c.entity, c.sample, c.v FROM cells c JOIN rowok USING (entity) JOIN colok USING (sample)), miss AS (SELECT entity, sample FROM kept WHERE v IS NULL), pres AS (SELECT entity, sample, v FROM kept WHERE v IS NOT NULL), needy AS (SELECT DISTINCT entity FROM miss), dst AS (SELECT a.entity AS needy, b.entity AS donor, sqrt(avg((a.v - b.v) * (a.v - b.v))) AS dist FROM pres a JOIN needy n ON a.entity = n.entity JOIN pres b ON a.sample = b.sample AND a.entity <> b.entity GROUP BY 1, 2 HAVING count(*) >= 2), cand AS (SELECT m.entity, m.sample, d.donor, round(CAST(CAST(d.dist AS VARCHAR) AS DECIMAL(38,18)), 6) AS rdist, p.v AS dv FROM miss m JOIN dst d ON m.entity = d.needy JOIN pres p ON p.entity = d.donor AND p.sample = m.sample), sel AS (SELECT entity, sample, dv, row_number() OVER (PARTITION BY entity, sample ORDER BY rdist, donor) AS rn FROM cand), fill AS (SELECT entity, sample, CAST(round(CAST(CAST(avg(dv) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS imputed FROM sel WHERE rn <= 5 GROUP BY 1, 2) SELECT k.entity, k.sample, k.v AS value, CASE WHEN k.v IS NOT NULL THEN k.v ELSE f.imputed END AS value_imputed FROM kept k LEFT JOIN fill f ON k.entity = f.entity AND k.sample = f.sample""")),

    Entry("q_knn_distances",
      // the SQL-expressible half of KNN imputation: needy->donor distances
      // over shared samples
      (s, d) => Impute.neighborDistances(
          knnCells(s, d).toDF("entity", "sample", "value"))
        .select(col("needy"), col("donor"), round(col("dist"), 6).as("dist"),
          col("shared")),
      Some("""WITH cells AS (SELECT user_id, event_type, CASE WHEN event_type = 'error' AND user_id % 5 = 0 THEN NULL ELSE CAST(round(CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) END AS v FROM events GROUP BY 1, 2), needy AS (SELECT DISTINCT user_id AS ne FROM cells WHERE v IS NULL), pres AS (SELECT user_id, event_type, v FROM cells WHERE v IS NOT NULL) SELECT a.user_id AS needy, b.user_id AS donor, CAST(round(CAST(CAST(sqrt(avg((a.v - b.v) * (a.v - b.v))) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS dist, count(*) AS shared FROM pres a JOIN needy ON a.user_id = needy.ne JOIN pres b ON a.event_type = b.event_type AND a.user_id <> b.user_id GROUP BY 1, 2 HAVING count(*) >= 2""")),

    Entry("q_combat_moments",
      // the SQL-expressible front half of ComBat: per-gene standardization
      // + per-(gene,batch) moments
      (s, d) => Combat.batchMoments(Combat.standardizedPreJoined(
          combatData(s, d).withColumn("batch",
            concat(lit("b"), (col("sample") % 3).cast("string")))))
        .select(col("gene"), col("batch"), round(col("gamma_hat"), 6).as("gamma_hat"),
          round(col("delta2_hat"), 6).as("delta2_hat"), col("n")),
      Some("""WITH d AS (SELECT CAST(l_partkey % 50 AS VARCHAR) AS gene, l_orderkey * 10 + l_linenumber AS sample, l_extendedprice AS value, concat('b', CAST((l_orderkey * 10 + l_linenumber) % 3 AS VARCHAR)) AS batch FROM lineitem), g AS (SELECT gene, avg(value) AS alpha, stddev_samp(value) AS sigma FROM d GROUP BY 1), z AS (SELECT d.gene, d.batch, (d.value - g.alpha) / CASE WHEN g.sigma > 0 THEN g.sigma END AS z FROM d JOIN g USING (gene)) SELECT gene, batch, CAST(round(CAST(CAST(avg(z) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS gamma_hat, CAST(round(CAST(CAST(var_samp(z) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS delta2_hat, count(*) AS n FROM z GROUP BY 1, 2""")),

    Entry("q_hclust_probes",
      // per-gene probe clustering (1-cor complete linkage, cutree). Cell
      // values are 6-decimal exact means, the kernel's distances come from
      // exact decimal raw sums with a fixed closing op order, and merge
      // ties break on canonical cluster-id pairs — so the agglomeration is
      // bit-replayable: the oracle unrolls all 19 possible merge steps
      // (extra steps no-op once best > h or one cluster remains).
      (s, d) => Models.clusterProbesPerGene(
        t(s, d, "lineitem")
          .withColumn("probe", (col("l_partkey") % 20).cast("string"))
          .groupBy(col("l_returnflag").as("gene"), col("probe"),
            col("l_suppkey").cast("string").as("sample"))
          .agg(round(Q.sumDec(col("l_extendedprice")) / count(lit(1)), 6).as("value")),
        "gene", "probe", "sample", "value").toDF(),
      Some(hclustOracleSql(steps = 19, h = 0.6)))
  )

  /** DuckDB replay of Combat.adjustPreJoinedFixed over the q_combat
    * fixture. Every aggregate is an exact DECIMAL raw sum (the kernel
    * mirrors this), so alpha/sigma, the (gene,batch) moments, and the
    * cross-gene priors are bit-identical doubles on both sides; the EB
    * fixed point then unrolls into `iters` scalar CTE steps. Spark round
    * is mimicked with the varchar-decimal form throughout. */
  /** String-free grid quantizer mirroring the kernel's floor(x*g+0.5)/g
    * (see Combat.adjustPreJoinedFixed — the varchar-decimal mimic is
    * unsound when Java's pre-19 toString spells a double non-shortest). */
  private def qSql(x: String, g: String) =
    s"floor(($x) * CAST($g AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST($g AS DOUBLE)"

  /** The standardization front half shared by the parametric and
    * nonparametric fixed oracles: fixture → exact-decimal gene stats →
    * quantized z (z6t) → per-(gene,batch) sufficient sums + quantized
    * moments (gb2 keeps sz/szz for the nonparametric integration).
    * Mirrors Combat.fixedStandardizedMoments term for term. */
  private def combatFixedFrontSql: String =
    s"""d AS MATERIALIZED (SELECT CAST(l_partkey % 50 AS VARCHAR) AS gene, l_orderkey * 10 + l_linenumber AS sample, l_extendedprice AS value, concat('b', CAST((l_orderkey * 10 + l_linenumber) % 3 AS VARCHAR)) AS batch FROM lineitem), gs AS MATERIALIZED (SELECT gene, count(value) AS n_g, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1, CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2 FROM d GROUP BY 1), gs2 AS MATERIALIZED (SELECT gene, s1 / n_g AS alpha, CASE WHEN n_g > 1 THEN sqrt(greatest((s2 - s1 * s1 / n_g) / (n_g - 1), CAST(0.0 AS DOUBLE))) END AS sigma FROM gs), z AS MATERIALIZED (SELECT d.gene, d.sample, d.batch, d.value, g.alpha, g.sigma, (d.value - g.alpha) / (CASE WHEN g.sigma > 0 THEN g.sigma END) AS z FROM d JOIN gs2 g USING (gene)), z6t AS MATERIALIZED (SELECT *, ${qSql("z", "1000000.0")} AS z6 FROM z), gb AS MATERIALIZED (SELECT gene, batch, count(z6) AS n, CAST(sum(CAST(z6 AS DECIMAL(17,6))) AS DOUBLE) AS sz, CAST(round(sum(CAST(z6 AS DECIMAL(17,6)) * CAST(z6 AS DECIMAL(17,6))), 8) AS DOUBLE) AS szz FROM z6t GROUP BY 1, 2), gb2 AS MATERIALIZED (SELECT gene, batch, n, sz, szz, ${qSql("sz / n", "1000000000000.0")} AS gamma_hat, CASE WHEN n > 1 THEN ${qSql("(szz - sz * sz / n) / (n - 1)", "1000000000000.0")} END AS delta2_hat FROM gb)"""

  /** DuckDB replay of Combat.adjustPreJoinedNonParamFixed: the
    * int.eprior Monte-Carlo integration as a within-batch gene×gene
    * join over the gb2 moments — log-likelihoods quantized to the 1e-6
    * grid straight after the transcendental, per-gene max-normalized
    * weights floored to BIGINT micro-units, weighted sums as exact
    * DECIMAL(16,12)×BIGINT products rounded to scale 6 before the
    * double cast. No iteration unroll: int.eprior is closed-form. */
  private def combatNonParamOracleSql: String = {
    val l = s"(-(i.n / CAST(2.0 AS DOUBLE))) * ln(CAST(6.283185307179586 AS DOUBLE) * j.d_j) - (i.szz - CAST(2.0 AS DOUBLE) * j.g_j * i.sz + i.n * j.g_j * j.g_j) / (CAST(2.0 AS DOUBLE) * j.d_j)"
    s"""WITH $combatFixedFrontSql, jt AS MATERIALIZED (SELECT gene AS gene_j, batch, gamma_hat AS g_j, delta2_hat AS d_j FROM gb2 WHERE delta2_hat IS NOT NULL AND delta2_hat > 0), pairs AS MATERIALIZED (SELECT i.gene, i.batch, j.g_j, j.d_j, ${qSql(l, "1000000.0")} AS l FROM gb2 i JOIN jt j ON i.batch = j.batch AND i.gene <> j.gene_j), wts AS MATERIALIZED (SELECT gene, batch, g_j, d_j, CAST(floor(exp(l - max(l) OVER (PARTITION BY batch, gene)) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w FROM pairs), star AS MATERIALIZED (SELECT gene, batch, CAST(round(sum(CAST(g_j AS DECIMAL(16,12)) * w), 6) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS gamma_star, CAST(round(sum(CAST(d_j AS DECIMAL(16,12)) * w), 6) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS delta2_star FROM wts GROUP BY 1, 2 HAVING sum(w) > 0) SELECT z.gene, z.sample, z.batch, z.value, ${qSql("z.sigma * (z.z - s.gamma_star) / sqrt(s.delta2_star) + z.alpha", "1000000.0")} AS adjusted FROM z6t z LEFT JOIN star s ON z.gene = s.gene AND z.batch = s.batch"""
  }

  private def combatFixedOracleSql(iters: Int): String = {
    val base = s"""$combatFixedFrontSql, pr AS MATERIALIZED (SELECT batch, count(*) AS k, CAST(sum(CAST(gamma_hat AS DECIMAL(14,12))) AS DOUBLE) AS sg, CAST(round(sum(CAST(gamma_hat AS DECIMAL(14,12)) * CAST(gamma_hat AS DECIMAL(14,12))), 12) AS DOUBLE) AS sgg, count(delta2_hat) AS kd, CAST(sum(CAST(delta2_hat AS DECIMAL(14,12))) AS DOUBLE) AS sd, CAST(round(sum(CAST(delta2_hat AS DECIMAL(14,12)) * CAST(delta2_hat AS DECIMAL(14,12))), 12) AS DOUBLE) AS sdd FROM gb2 GROUP BY 1), pr2 AS MATERIALIZED (SELECT batch, sg / k AS gamma_bar, CASE WHEN k > 1 THEN (sgg - sg * sg / k) / (k - 1) END AS tau2, sd / kd AS d_mean, CASE WHEN kd > 1 THEN (sdd - sd * sd / kd) / (kd - 1) END AS d_var FROM pr), pr3 AS MATERIALIZED (SELECT batch, gamma_bar, tau2, d_mean, CAST(2.0 AS DOUBLE) + d_mean * d_mean / (CASE WHEN d_var > 0 THEN d_var END) AS lambda FROM pr2), pr4 AS MATERIALIZED (SELECT *, d_mean * (lambda - CAST(1.0 AS DOUBLE)) AS theta FROM pr3), e0 AS MATERIALIZED (SELECT g.gene, g.batch, g.gamma_hat, g.n, coalesce(g.delta2_hat, p.d_mean, CAST(1.0 AS DOUBLE)) AS d2h, p.gamma_bar, coalesce(p.tau2, CAST(0.0 AS DOUBLE)) AS tau2, coalesce(p.lambda, CAST(2.0 AS DOUBLE)) AS lam, coalesce(p.theta, g.delta2_hat, p.d_mean, CAST(1.0 AS DOUBLE)) AS th, g.gamma_hat AS g_cur, greatest(coalesce(g.delta2_hat, p.d_mean, CAST(1.0 AS DOUBLE)), 1e-8) AS d2_cur FROM gb2 g JOIN pr4 p USING (batch))"""
    val its = (1 to iters).map { k =>
      s"""e$k AS MATERIALIZED (SELECT gene, batch, gamma_hat, n, d2h, gamma_bar, tau2, lam, th, g_new AS g_cur, greatest((th + CAST(0.5 AS DOUBLE) * ((n - 1) * d2h + n * (gamma_hat - g_new) * (gamma_hat - g_new))) / (n / CAST(2.0 AS DOUBLE) + lam - CAST(1.0 AS DOUBLE)), 1e-8) AS d2_cur FROM (SELECT *, CASE WHEN tau2 > 0 THEN (n * tau2 * gamma_hat + d2_cur * gamma_bar) / (n * tau2 + d2_cur) ELSE gamma_bar END AS g_new FROM e${k - 1}))"""
    }.mkString(", ")
    s"""WITH $base, $its SELECT z.gene, z.sample, z.batch, z.value, floor((z.sigma * (z.z - e.g_cur) / sqrt(e.d2_cur) + z.alpha) * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE) AS adjusted FROM z6t z JOIN e$iters e ON z.gene = e.gene AND z.batch = e.batch"""
  }

  /** DuckDB replay of GlmNb.fitPerRegionFixed over the q_glm_nb fixture:
    * the IRLS recurrence unrolled — per step, one aggregate CTE (the five
    * weighted sums over the data joined to the previous coefficients) and
    * one update CTE, for the full (cf*) and null (cn*) models; then the NB
    * log-likelihoods (DuckDB has lgamma) and the LRT. Every arithmetic
    * step mirrors the kernel term for term (same clamps, same association
    * order; phi = 0.1 so inv = 1.0/phi is exactly 10.0 in IEEE double).
    * Summation order across engines differs only at ulp scale and the
    * recurrence is contractive, so 6-decimal coefficient / 4-decimal LRT
    * rounding absorbs it (the q_pca_batch precedent). */
  private def glmNbOracleSql(iters: Int): String = glmNbUnrollCtes(iters,
    """SELECT CAST(l_partkey % 100 AS VARCHAR) AS region, l_quantity AS y, CASE WHEN l_linestatus = 'O' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS x, ln(CAST(1.0 AS DOUBLE) + l_tax) AS off FROM lineitem""") match {
    case (ctes, finalSelect) => s"WITH $ctes $finalSelect"
  }

  /** The 8-step IRLS unroll over a caller-supplied observation relation
    * (region VARCHAR, y, x, off) — shared by the standalone
    * q_glm_nb_fixed oracle and the composed ABCD-DNA twin. Returns
    * (cte chain, final SELECT yielding region/n/intercept/log_fc/
    * lrt_stat); composers may wrap or extend the final select. `pre`
    * prefixes every CTE name so two fits can unroll side by side in one
    * statement (the Feber naive + CN-adjusted pair). */
  private[queries] def glmNbUnrollCtes(iters: Int, dSql: String,
                                       pre: String = ""): (String, String) = {
    val d = s"""${pre}d AS MATERIALIZED ($dSql), ${pre}cf0 AS MATERIALIZED (SELECT region, count(*) AS n, ln(greatest(sum(y) / count(*), CAST(0.1 AS DOUBLE))) - sum(off) / count(*) AS b0, CAST(0.0 AS DOUBLE) AS b1 FROM ${pre}d GROUP BY 1), ${pre}cn0 AS MATERIALIZED (SELECT region, b0 FROM ${pre}cf0)"""
    // per-row weights/working response at coefficients c: mirrors the
    // kernel's eta/mu/w/z lines (clamps and parenthesization included)
    def rows(coef: String, eta: String) =
      s"""(SELECT r.region, r.x, r.mu / (CAST(1.0 AS DOUBLE) + CAST(0.1 AS DOUBLE) * r.mu) AS w, (r.eta - r.off) + (r.y - r.mu) / r.mu AS z FROM (SELECT d.region, d.x, d.y, d.off, $eta AS eta, least(greatest(exp(greatest($eta, CAST(-19.0 AS DOUBLE))), 1e-8), 1e12) AS mu FROM ${pre}d d JOIN $coef c USING (region)) r)"""
    val etaF = "c.b0 + c.b1 * d.x + d.off"
    val etaN = "c.b0 + d.off"
    val its = (1 to iters).map { k =>
      val f = s"""${pre}f$k AS MATERIALIZED (SELECT region, sum(w) AS s00, sum(w * x) AS s01, sum(w * x * x) AS s11, sum(w * z) AS t0, sum(w * x * z) AS t1 FROM ${rows(s"${pre}cf${k - 1}", etaF)} GROUP BY 1), ${pre}cf$k AS MATERIALIZED (SELECT region, CASE WHEN abs(s00 * s11 - s01 * s01) < 1e-12 THEN t0 / s00 ELSE (s11 * t0 - s01 * t1) / (s00 * s11 - s01 * s01) END AS b0, CASE WHEN abs(s00 * s11 - s01 * s01) < 1e-12 THEN CAST(0.0 AS DOUBLE) ELSE (s00 * t1 - s01 * t0) / (s00 * s11 - s01 * s01) END AS b1 FROM ${pre}f$k)"""
      val n = s"""${pre}n$k AS MATERIALIZED (SELECT region, sum(w) AS s00, sum(w * z) AS t0 FROM ${rows(s"${pre}cn${k - 1}", etaN)} GROUP BY 1), ${pre}cn$k AS MATERIALIZED (SELECT region, t0 / s00 AS b0 FROM ${pre}n$k)"""
      s"$f, $n"
    }.mkString(", ")
    // nbLogLik with inv = 10.0; mu is already >= 1e-8 so the kernel's
    // max(mu, 1e-12) floor is a no-op on both sides
    def ll(name: String, coef: String, eta: String) =
      s"""$name AS MATERIALIZED (SELECT region, sum(lgamma(y + CAST(10.0 AS DOUBLE)) - lgamma(CAST(10.0 AS DOUBLE)) - lgamma(y + CAST(1.0 AS DOUBLE)) + CAST(10.0 AS DOUBLE) * ln(CAST(10.0 AS DOUBLE) / (CAST(10.0 AS DOUBLE) + mu)) + y * ln(mu / (CAST(10.0 AS DOUBLE) + mu))) AS ll FROM (SELECT d.region, d.y, least(greatest(exp(greatest($eta, CAST(-19.0 AS DOUBLE))), 1e-8), 1e12) AS mu FROM ${pre}d d JOIN $coef c USING (region)) GROUP BY 1)"""
    def r(x: String, dec: Int) =
      s"CAST(round(CAST(CAST($x AS VARCHAR) AS DECIMAL(38,18)), $dec) AS DOUBLE)"
    (s"""$d, $its, ${ll(s"${pre}llf", s"${pre}cf$iters", etaF)}, ${ll(s"${pre}lln", s"${pre}cn$iters", etaN)}""",
      s"""SELECT c.region, ${pre}cf0.n AS n, ${r("c.b0", 6)} AS intercept, ${r("c.b1", 6)} AS log_fc, ${r(s"greatest(CAST(0.0 AS DOUBLE), 2.0 * (${pre}llf.ll - ${pre}lln.ll))", 4)} AS lrt_stat FROM ${pre}cf$iters c JOIN ${pre}cf0 USING (region) JOIN ${pre}llf USING (region) JOIN ${pre}lln USING (region)""")
  }

  /** DuckDB replay of BetaMixture.fitPerGeneFixed (k=2) over the
    * q_beta_mixture fixture. The EM runs over the per-gene distinct-value
    * histogram exactly as the kernel does: `hist` is the run-length
    * compression (the discount grid has ~11 support points per gene),
    * `ch` the cumulative multiset position feeding the quantile-split
    * init's partial-count blocks, `s0` the method-of-moments init, then
    * per step one row-level E stage (log-space responsibilities with the
    * -700 exp floor) and one aggregate M stage feeding a nested
    * momentsToAB update. Every clamp and association order mirrors the
    * kernel line for line; ln(1-v) vs the kernel's log1p(-v) and the
    * engines' exp/ln/lgamma differ only at ulp scale, which the final
    * rounding absorbs (EM is contractive). */
  /** Spark-style rounding in DuckDB: Spark's `round(double, d)` rounds
    * HALF_UP on `BigDecimal.valueOf(x)` = the SHORTEST decimal repr, so
    * the oracle goes double → VARCHAR (DuckDB prints the same shortest
    * repr) → DECIMAL → round. The intermediate scale must preserve the
    * repr EXACTLY: scale 12 truncated `…49999999999997`-shaped reprs to
    * `…5000`, flipping the 6-decimal result one ulp away from Spark's
    * (first observed on a q_kmeans_increment centroid at sf0.1). A
    * ≤17-significant-digit repr of any |x| < 10^20 is exact at scale 18
    * (the KMV estimate, worst case ~7·10^19, still fits 38-18). */
  private[queries] def rndSql(x: String, dec: Int): String =
    s"CAST(round(CAST(CAST($x AS VARCHAR) AS DECIMAL(38,18)), $dec) AS DOUBLE)"

  /** The EM-unroll CTE chain (raw → hist → gn → ch → ia → s0 → e1/s1 …
    * e`iters`/s`iters`) over a caller-supplied `raw` subquery producing
    * (gene VARCHAR, v DOUBLE in (0,1)). Shared by the standalone
    * q_beta_mixture_fixed oracle and the composed MethylMix twin. */
  private[queries] def betaMixtureFixedCtes(iters: Int, rawSql: String): String = {
    val one = "CAST(1.0 AS DOUBLE)"
    val zero = "CAST(0.0 AS DOUBLE)"
    val p999 = "CAST(0.999 AS DOUBLE)"
    // quantile-split block counts: block1 covers multiset positions
    // [0, n/2), block2 [n/2, n) — a straddling run contributes partial
    // counts to both, exactly the kernel's begin/end clipping
    val h0 = "CAST(greatest(1, g.nb // 2) AS DOUBLE)"
    val h1 = "CAST(greatest(g.nb // 2 + 1, g.nb) AS DOUBLE)"
    val lo1 = "CAST(g.nb // 2 AS DOUBLE)"
    val c1 = s"greatest($zero, least(c.cend, $h0) - greatest(c.cend - c.cnt, $zero))"
    val c2 = s"greatest($zero, least(c.cend, $h1) - greatest(c.cend - c.cnt, $lo1))"
    val base =
      s"""raw AS MATERIALIZED ($rawSql), """ +
      s"""hist AS MATERIALIZED (SELECT gene, v, CAST(count(*) AS DOUBLE) AS cnt, ln(v) AS lx, ln($one - v) AS l1x FROM raw GROUP BY 1, 2), """ +
      s"""gn AS MATERIALIZED (SELECT gene, CAST(sum(cnt) AS BIGINT) AS nb, sum(cnt) AS nd FROM hist GROUP BY 1 HAVING sum(cnt) >= 4), """ +
      s"""ch AS MATERIALIZED (SELECT gene, v, cnt, lx, l1x, sum(cnt) OVER (PARTITION BY gene ORDER BY v ROWS UNBOUNDED PRECEDING) AS cend FROM hist), """ +
      s"""ia AS MATERIALIZED (SELECT c.gene, g.nb, g.nd, sum($c1) AS w1b, sum($c1 * c.v) AS s11, sum($c1 * c.v * c.v) AS s21, sum($c2) AS w2b, sum($c2 * c.v) AS s12, sum($c2 * c.v * c.v) AS s22 FROM ch c JOIN gn g USING (gene) GROUP BY 1, 2, 3), """ +
      s"""s0 AS MATERIALIZED (SELECT gene, nb, nd, greatest(mu1 * t1, 1e-3) AS a1, greatest(($one - mu1) * t1, 1e-3) AS b1, w1b / nd AS w1, greatest(mu2 * t2, 1e-3) AS a2, greatest(($one - mu2) * t2, 1e-3) AS b2, w2b / nd AS w2 FROM (SELECT *, cap1 / vv1 - $one AS t1, cap2 / vv2 - $one AS t2 FROM (SELECT *, least(v1, cap1 * $p999) AS vv1, least(v2, cap2 * $p999) AS vv2 FROM (SELECT *, mu1 * ($one - mu1) AS cap1, mu2 * ($one - mu2) AS cap2, greatest(CASE WHEN w1b > 1 THEN (s21 - w1b * mu1 * mu1) / (w1b - 1) ELSE 1e-6 END, 1e-6) AS v1, greatest(CASE WHEN w2b > 1 THEN (s22 - w2b * mu2 * mu2) / (w2b - 1) ELSE 1e-6 END, 1e-6) AS v2 FROM (SELECT *, s11 / w1b AS mu1, s12 / w2b AS mu2 FROM ia)))))"""
    def lnd(a: String, b: String, w: String) =
      s"ln(greatest($w, 1e-300)) + ($a - $one) * c.lx + ($b - $one) * c.l1x - (lgamma($a) + lgamma($b) - lgamma($a + $b))"
    val its = (1 to iters).map { k =>
      s"""e$k AS MATERIALIZED (SELECT gene, nb, nd, a1, b1, w1, a2, b2, w2, sum(cnt * rsp1) AS w1n, sum(cnt * rsp1 * v) AS m11, sum(cnt * rsp1 * v * v) AS m21, sum(cnt * rsp2) AS w2n, sum(cnt * rsp2 * v) AS m12, sum(cnt * rsp2 * v * v) AS m22, sum(cnt * (mx + ln(tot))) AS ll FROM (SELECT *, r1 / tot AS rsp1, r2 / tot AS rsp2 FROM (SELECT *, r1 + r2 AS tot FROM (SELECT *, CASE WHEN ld1 - mx < -700 THEN $zero ELSE exp(ld1 - mx) END AS r1, CASE WHEN ld2 - mx < -700 THEN $zero ELSE exp(ld2 - mx) END AS r2 FROM (SELECT *, greatest(ld1, ld2) AS mx FROM (SELECT c.gene, c.v, c.cnt, s.nb, s.nd, s.a1, s.b1, s.w1, s.a2, s.b2, s.w2, ${lnd("s.a1", "s.b1", "s.w1")} AS ld1, ${lnd("s.a2", "s.b2", "s.w2")} AS ld2 FROM ch c JOIN s${k - 1} s USING (gene)))))) GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9), """ +
      s"""s$k AS MATERIALIZED (SELECT gene, nb, nd, ll, CASE WHEN w1n < 1e-12 THEN a1 ELSE greatest(mu1 * t1, 1e-3) END AS a1, CASE WHEN w1n < 1e-12 THEN b1 ELSE greatest(($one - mu1) * t1, 1e-3) END AS b1, CASE WHEN w1n < 1e-12 THEN w1 ELSE w1n / nd END AS w1, CASE WHEN w2n < 1e-12 THEN a2 ELSE greatest(mu2 * t2, 1e-3) END AS a2, CASE WHEN w2n < 1e-12 THEN b2 ELSE greatest(($one - mu2) * t2, 1e-3) END AS b2, CASE WHEN w2n < 1e-12 THEN w2 ELSE w2n / nd END AS w2 FROM (SELECT *, cap1 / vv1 - $one AS t1, cap2 / vv2 - $one AS t2 FROM (SELECT *, least(v1, cap1 * $p999) AS vv1, least(v2, cap2 * $p999) AS vv2 FROM (SELECT *, mu1 * ($one - mu1) AS cap1, mu2 * ($one - mu2) AS cap2 FROM (SELECT *, greatest(m21 / w1n - mu1 * mu1, 1e-8) AS v1, greatest(m22 / w2n - mu2 * mu2, 1e-8) AS v2 FROM (SELECT *, m11 / w1n AS mu1, m12 / w2n AS mu2 FROM e$k))))))"""
    }.mkString(", ")
    s"$base, $its"
  }

  /** Per-component final projection over the unroll's s`iters` state:
    * canonical mean-ordered comp numbering, the fixed-k twin's
    * n_components, and the raw (unrounded) a/b/weight/mean/ll columns. */
  private[queries] def betaMixtureFixedFinCte(iters: Int): String =
    s"fin AS (SELECT gene, nd, ll, a1 AS a, b1 AS b, w1 AS weight, a1 / (a1 + b1) AS mean, 1 AS j FROM s$iters UNION ALL SELECT gene, nd, ll, a2, b2, w2, a2 / (a2 + b2), 2 FROM s$iters)"

  private def betaMixtureFixedOracleSql(iters: Int): String = {
    def rnd = rndSql _
    val one = "CAST(1.0 AS DOUBLE)"
    val raw = s"SELECT CAST(l_partkey % 500 AS VARCHAR) AS gene, least($one - 1e-6, greatest(1e-6, (l_discount + CAST(0.005 AS DOUBLE)) / CAST(0.12 AS DOUBLE))) AS v FROM lineitem"
    s"""WITH ${betaMixtureFixedCtes(iters, raw)}, ${betaMixtureFixedFinCte(iters)} SELECT gene, CAST(2 AS INTEGER) AS n_components, CAST(row_number() OVER (PARTITION BY gene ORDER BY mean, j) AS INTEGER) AS comp, ${rnd("a", 6)} AS a, ${rnd("b", 6)} AS b, ${rnd("weight", 6)} AS weight, ${rnd("mean", 6)} AS mean, ${rnd("ll", 3)} AS log_lik, ${rnd(s"CAST(-2.0 AS DOUBLE) * ll + CAST(5.0 AS DOUBLE) * ln(nd)", 3)} AS bic FROM fin"""
  }

  /** DuckDB replay of clusterProbesPerGene over the q_hclust_probes
    * fixture: pairwise 1-cor distances from exact DECIMAL raw sums (the
    * kernel mirrors this bit-for-bit), then `steps` unrolled merge rounds
    * — per round: cluster-pair complete-linkage distances, the per-gene
    * argmin (d, ca, cb), and the membership remap. MATERIALIZED CTEs keep
    * the chain linear. */
  private def hclustOracleSql(steps: Int, h: Double): String = {
    val cells = """cells AS MATERIALIZED (SELECT l_returnflag AS gene, CAST(l_partkey % 20 AS VARCHAR) AS probe, CAST(l_suppkey AS VARCHAR) AS sample, CAST(round(CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE) AS value FROM lineitem GROUP BY 1, 2, 3)"""
    val pairs = """pr AS MATERIALIZED (SELECT DISTINCT gene, probe FROM cells), pg AS MATERIALIZED (SELECT a.gene, a.probe AS pa, b.probe AS pb FROM pr a JOIN pr b ON a.gene = b.gene AND a.probe < b.probe), pp AS MATERIALIZED (SELECT a.gene, a.probe AS pa, b.probe AS pb, CAST(count(*) AS DOUBLE) AS n, CAST(sum(CAST(a.value AS DECIMAL(19,6))) AS DOUBLE) AS sx, CAST(sum(CAST(b.value AS DECIMAL(19,6))) AS DOUBLE) AS sy, CAST(sum(CAST(a.value AS DECIMAL(19,6)) * CAST(b.value AS DECIMAL(19,6))) AS DOUBLE) AS sxy, CAST(sum(CAST(a.value AS DECIMAL(19,6)) * CAST(a.value AS DECIMAL(19,6))) AS DOUBLE) AS sxx, CAST(sum(CAST(b.value AS DECIMAL(19,6)) * CAST(b.value AS DECIMAL(19,6))) AS DOUBLE) AS syy FROM cells a JOIN cells b ON a.gene = b.gene AND a.sample = b.sample AND a.probe < b.probe GROUP BY 1, 2, 3), pd AS MATERIALIZED (SELECT g.gene, g.pa, g.pb, CASE WHEN pp.n IS NULL OR pp.n < 2 THEN 1.0 WHEN (pp.n * pp.sxx - pp.sx * pp.sx) <= 0 OR (pp.n * pp.syy - pp.sy * pp.sy) <= 0 THEN 1.0 ELSE 1.0 - (pp.n * pp.sxy - pp.sx * pp.sy) / sqrt((pp.n * pp.sxx - pp.sx * pp.sx) * (pp.n * pp.syy - pp.sy * pp.sy)) END AS d FROM pg g LEFT JOIN pp ON g.gene = pp.gene AND g.pa = pp.pa AND g.pb = pp.pb), s0 AS MATERIALIZED (SELECT gene, probe, probe AS cid FROM pr)"""
    val its = (1 to steps).map { k =>
      s"""d$k AS MATERIALIZED (SELECT pd.gene, CASE WHEN a.cid < b.cid THEN a.cid ELSE b.cid END AS ca, CASE WHEN a.cid < b.cid THEN b.cid ELSE a.cid END AS cb, max(pd.d) AS d FROM pd JOIN s${k - 1} a ON pd.gene = a.gene AND pd.pa = a.probe JOIN s${k - 1} b ON pd.gene = b.gene AND pd.pb = b.probe WHERE a.cid <> b.cid GROUP BY 1, 2, 3), b$k AS MATERIALIZED (SELECT gene, ca, cb FROM (SELECT gene, ca, cb, d, row_number() OVER (PARTITION BY gene ORDER BY d, ca, cb) AS rn FROM d$k) WHERE rn = 1 AND d <= $h), s$k AS MATERIALIZED (SELECT s.gene, s.probe, CASE WHEN b.cb IS NOT NULL AND s.cid = b.cb THEN b.ca ELSE s.cid END AS cid FROM s${k - 1} s LEFT JOIN b$k b ON s.gene = b.gene)"""
    }.mkString(", ")
    s"WITH $cells, $pairs, $its SELECT gene, probe, CAST(dense_rank() OVER (PARTITION BY gene ORDER BY cid) AS INTEGER) AS cluster FROM s$steps"
  }
}
