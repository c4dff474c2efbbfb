package graft.queries

import org.apache.spark.sql.functions._
import graft.omics.{BetaMixture, Combat, DriverNet, GlmNb, Impute, Models}
import Q.{Entry, t}

/** Per-group model kernels (SURVEY §2.4's non-algebraic rows) wired over
  * the driver tables. These are not SQL-expressible, so the entries are
  * rows-only for the driver; each kernel carries a golden ScalaTest
  * (OmicsKernelSpec) against hand-computed / published values instead. */
object OmicsQueries {

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
        val influence = Seq(("click", "view"), ("error", "purchase"),
          ("signup", "view"), ("signup", "purchase")).toDF("gene_a", "gene_b")
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
      // MethylMix covariate branch: y ~ x1 + x2 per group via in-task
      // normal equations
      (s, d) => Models.olsMultiPerGroup(t(s, d, "lineitem"),
          "l_returnflag", "l_extendedprice", Seq("l_quantity", "l_discount"))
        .toDF().withColumn("coef", col("coef").cast("string")),
      None),

    Entry("q_combat",
      // ComBat EB batch adjustment on a long-form slice
      (s, d) => {
        val data = t(s, d, "lineitem").select(
          (col("l_partkey") % 50).cast("string").as("gene"),
          concat(col("l_orderkey").cast("string"), lit("_"),
            col("l_linenumber").cast("string")).as("sample"),
          col("l_extendedprice").as("value"))
        val batches = t(s, d, "lineitem").select(
          concat(col("l_orderkey").cast("string"), lit("_"),
            col("l_linenumber").cast("string")).as("sample"),
          col("l_returnflag").as("batch")).distinct()
        Combat.adjust(data, batches)
      },
      None),

    Entry("q_knn_impute",
      // KNN imputation: per-user per-type mean values with 'error' cells
      // knocked out as synthetic missingness
      (s, d) => {
        val cells = Q.events(s, d).groupBy("user_id", "event_type")
          .agg(round(avg("value"), 6).as("v"))
          .withColumn("v", when(col("event_type") === "error", lit(null))
            .otherwise(col("v")))
        Impute.knnImpute(cells, "user_id", "event_type", "v", k = 5)
      },
      None),

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
