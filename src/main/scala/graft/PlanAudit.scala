package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints physical-plan red flags for every registered query
  * (BroadcastNestedLoopJoin / CartesianProduct outside intentional cross
  * joins, scans without pushed filters where one was expected, exchange
  * counts). Usage: runMain graft.PlanAudit <sfDir> [queryName...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // audit-only: AQE's wrapper hides codegen spans and double-prints
      // the plan; production sessions keep AQE on
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // intentional non-equi plans: true cross expansions (small broadcast
    // dims), single-row broadcast prunes/cutoffs, q_ann_brute's
    // broadcast-queries-vs-streamed-corpus BNLJ. ppmJoin's lazy range
    // prune adds one single-row broadcast BNLJ to every plan using it.
    val intentionalCross = Set("q_cross_join", "q_pipeline_massquery",
      "q_pipeline_transitions", "q_pipeline_herald", "q_drivernet_greedy",
      "q_drivernet_permutation", "q_ann_brute",
      "q_ppm_join",   // single-row structure min/max range prune
      "q_tmm_factor", // single-row percentile cutoff broadcast-joined back
      "q_pca_batch",  // single-row grand-mean broadcast-joined back
      "q_dist_shift", // single-row corpus-total broadcast-joined back
      "q_dedup_embedding") // exactness-baseline all-pairs by definition
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
          val cart = "CartesianProduct".r.findAllIn(plan).size
          val exch = "Exchange".r.findAllIn(plan).size
          // WholeStageCodegen spans print as "*(id) Operator" in toString
          val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
          val flags = new StringBuilder
          if ((bnlj > 0 || cart > 0) && !intentionalCross(name))
            flags.append(s" !!NESTED_LOOP(bnlj=$bnlj,cart=$cart)")
          // q_pipeline_herald fused-unrolls its levels into one plan, so
          // the intentional broadcast-rules cross appears once per level
          // reference (audited: all BNLJs are the small rules dim, level
          // exchanges dedup via ReusedExchange)
          val crossAllowance = if (name == "q_pipeline_herald") 3 else 2
          if (bnlj + cart > crossAllowance && intentionalCross(name))
            flags.append(s" !!EXTRA_CROSS(bnlj=$bnlj,cart=$cart)")
          println(f"$name%-28s exchanges=$exch%-3d codegen=$wsc%-3d$flags")
        } catch {
          case e: Throwable => println(f"$name%-28s PLAN_ERROR ${e.getMessage.take(80)}")
        }
      }
    spark.stop()
  }
}
