package graft.queries

import org.apache.spark.sql.functions._
import graft.omics.{BetaMixture, Combat, DriverNet, GlmNb, Impute, Models}
import graft.stats.Stats
import Q.{Entry, t}

/** Per-group model kernels (SURVEY §2.4's non-algebraic rows) wired over
  * the driver tables. These are not SQL-expressible, so the entries are
  * rows-only for the driver; each kernel carries a golden ScalaTest
  * (OmicsKernelSpec) against hand-computed / published values instead. */
object OmicsQueries {

  /** Shared fixture: per-(user,type) mean values with 20% of 'error' cells
    * nulled as synthetic missingness. */
  private def knnCells(s: org.apache.spark.sql.SparkSession, d: String) =
    Q.events(s, d).groupBy("user_id", "event_type")
      .agg(round(avg("value"), 6).as("v"))
      .withColumn("v", when(col("event_type") === "error" &&
        col("user_id") % 5 === 0, lit(null)).otherwise(col("v")))

  private def combatData(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "lineitem").select(
      (col("l_partkey") % 50).cast("string").as("gene"),
      concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string"), lit("_"),
        col("l_partkey").cast("string"), lit("_"),
        col("l_suppkey").cast("string")).as("sample"),
      col("l_extendedprice").as("value"))

  private def combatBatches(s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "lineitem").select(
      concat(col("l_orderkey").cast("string"), lit("_"),
        col("l_linenumber").cast("string"), lit("_"),
        col("l_partkey").cast("string"), lit("_"),
        col("l_suppkey").cast("string")).as("sample"),
      col("l_returnflag").as("batch")).distinct()

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
      None),

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
      None),

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
      None),

    Entry("q_glm_nb",
      // ABCD-DNA NB-GLM with offsets per region; counts = l_quantity,
      // condition = linestatus, offset = log copy-number surrogate
      (s, d) => GlmNb.fitPerRegion(
        t(s, d, "lineitem")
          .withColumn("region", (col("l_partkey") % 100).cast("string"))
          .withColumn("grp", when(col("l_linestatus") === "O", 1.0).otherwise(0.0))
          .withColumn("off", log(lit(1.0) + col("l_tax"))),
        "region", "l_quantity", "grp", "off").toDF(),
      None),

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
      Some("""WITH g AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s1, CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s2, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s11, CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s22, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s12, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s1y, CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s2y, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy FROM lineitem GROUP BY 1), k AS (SELECT *, n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2) AS det FROM g), c AS (SELECT l_returnflag, n, sy, s1y, s2y, syy, det, (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)) / nullif(det, 0) AS b0, (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)) / nullif(det, 0) AS b1, (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)) / nullif(det, 0) AS b2, n * s22 - s2 * s2 AS c11 FROM k), f AS (SELECT l_returnflag, n, b0, b1, b2, syy - b0 * sy - b1 * s1y - b2 * s2y AS rss, syy - sy * sy / n AS tss, det, c11 FROM c) SELECT l_returnflag, CAST(n AS BIGINT) AS n, round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2, round(b1 / nullif(sqrt(rss / (n - 3) * c11 / det), 0), 6) AS t_slope, round(1.0 - rss / nullif(tss, 0), 6) AS r2 FROM f""")),

    Entry("q_combat",
      // ComBat EB batch adjustment on a long-form slice
      (s, d) => Combat.adjust(combatData(s, d), combatBatches(s, d)),
      None),

    Entry("q_knn_impute",
      // KNN imputation: per-user per-type mean values with 20% of the
      // 'error' cells knocked out (NOT the whole column — a fully-missing
      // column is dropped by the maxMissingCol filter and nothing would
      // ever be imputed)
      (s, d) => {
        Impute.knnImpute(knnCells(s, d), "user_id", "event_type", "v", k = 5)
      },
      None),

    Entry("q_knn_distances",
      // the SQL-expressible half of KNN imputation: needy->donor distances
      // over shared samples
      (s, d) => Impute.neighborDistances(
          knnCells(s, d).toDF("entity", "sample", "value"))
        .select(col("needy"), col("donor"), round(col("dist"), 6).as("dist"),
          col("shared")),
      Some("""WITH cells AS (SELECT user_id, event_type, CASE WHEN event_type = 'error' AND user_id % 5 = 0 THEN NULL ELSE round(avg(value), 6) END AS v FROM events GROUP BY 1, 2), needy AS (SELECT DISTINCT user_id AS ne FROM cells WHERE v IS NULL), pres AS (SELECT user_id, event_type, v FROM cells WHERE v IS NOT NULL) SELECT a.user_id AS needy, b.user_id AS donor, round(sqrt(avg((a.v - b.v) * (a.v - b.v))), 6) AS dist, count(*) AS shared FROM pres a JOIN needy ON a.user_id = needy.ne JOIN pres b ON a.event_type = b.event_type AND a.user_id <> b.user_id GROUP BY 1, 2 HAVING count(*) >= 2""")),

    Entry("q_combat_moments",
      // the SQL-expressible front half of ComBat: per-gene standardization
      // + per-(gene,batch) moments
      (s, d) => Combat.batchMoments(Combat.standardized(
          combatData(s, d), combatBatches(s, d)))
        .select(col("gene"), col("batch"), round(col("gamma_hat"), 6).as("gamma_hat"),
          round(col("delta2_hat"), 6).as("delta2_hat"), col("n")),
      Some("""WITH d AS (SELECT CAST(l_partkey % 50 AS VARCHAR) AS gene, concat(CAST(l_orderkey AS VARCHAR), '_', CAST(l_linenumber AS VARCHAR), '_', CAST(l_partkey AS VARCHAR), '_', CAST(l_suppkey AS VARCHAR)) AS sample, l_extendedprice AS value, l_returnflag AS batch FROM lineitem), g AS (SELECT gene, avg(value) AS alpha, stddev_samp(value) AS sigma FROM d GROUP BY 1), z AS (SELECT d.gene, d.batch, (d.value - g.alpha) / CASE WHEN g.sigma > 0 THEN g.sigma END AS z FROM d JOIN g USING (gene)) SELECT gene, batch, round(avg(z), 6) AS gamma_hat, round(var_samp(z), 6) AS delta2_hat, count(*) AS n FROM z GROUP BY 1, 2""")),

    Entry("q_hclust_probes",
      // per-gene probe clustering (1-cor complete linkage, cutree)
      (s, d) => Models.clusterProbesPerGene(
        t(s, d, "lineitem")
          .withColumn("probe", (col("l_partkey") % 20).cast("string"))
          .groupBy(col("l_returnflag").as("gene"), col("probe"),
            col("l_suppkey").cast("string").as("sample"))
          .agg(avg("l_extendedprice").as("value")),
        "gene", "probe", "sample", "value").toDF(),
      None)
  )
}
