package graft

import org.apache.spark.sql.functions._
import graft.chem.{MassOnlyBackend, TableChemBackend}
import graft.pipelines.Herald

/** The herald reaction loop and its single-plan fixed-depth twin emit
  * identical structure sets, including when the frontier exhausts before
  * the iteration budget. */
class HeraldSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("struct_id", "root", "iteration")
      .agg(round(min(col("mass")), 6).as("mass"))
      .as[(String, String, Int, Double)].collect().toSeq.sorted

  test("fused reaction loop equals the driver loop (mass-only backend)") {
    val structures = Seq(("S1", 100.0, "S1"), ("S2", 205.5, "S2"))
      .toDF("id", "mass", "root")
    val rules = Seq(("r_plus10", 10.0), ("r_minus25", -25.5))
      .toDF("rule_id", "mass_delta")
    // observed masses admit two expansion levels from S1 and one from S2
    val observed = Seq(100.0, 110.0, 120.0, 205.5, 180.0)
      .toDF("obs_mass")
    val loop = canon(Herald.reactionLoop(structures, rules, observed,
      MassOnlyBackend, iterations = 3, roundD = 1))
    val fused = canon(Herald.reactionLoopFused(structures, rules, observed,
      MassOnlyBackend, iterations = 3, roundD = 1))
    assert(fused == loop)
    assert(loop.exists(_._3 == 2)) // the expansion really went two deep
  }

  test("fused loop handles a frontier that exhausts early (table backend)") {
    val structures = Seq(("S1", 50.0, "S1")).toDF("id", "mass", "root")
    val rules = Seq("r1").toDF("rule_id")
    // one applicable product, whose own mass keys to nothing -> frontier
    // empties after level 1 while the budget allows 4
    val prodTab = Seq((50.0, "r1", "P60", 60.0))
      .toDF("sub_mass_key", "rule_id", "product_id", "product_mass")
    val observed = Seq(50.0, 60.0).toDF("obs_mass")
    val be = TableChemBackend(prodTab, keyD = 1)
    val loop = canon(Herald.reactionLoop(structures, rules, observed, be,
      iterations = 4, roundD = 1))
    val fused = canon(Herald.reactionLoopFused(structures, rules, observed, be,
      iterations = 4, roundD = 1))
    assert(fused == loop)
    assert(loop.map(_._1).sorted == Seq("P60", "S1"))
  }
}
