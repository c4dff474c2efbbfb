package graft.chem

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pluggable chemistry boundary isolating the reference's only
  * un-portable dependency (RDKit: MolFromSmiles / ReactionFromSmarts /
  * RunReactant / ExactMolWt — gizmos.py:193-234, 247-291;
  * heraldPathways.py:183-242).
  *
  * The engine's pipelines only consume the *relational* face of chemistry:
  * given a substrate row and a reaction rule, emit zero-or-more virtual
  * product rows (a UDTF/Generator shape) with a product mass and a
  * deterministic product key. `MassOnlyBackend` implements exactly the mass
  * arithmetic the downstream joins need; a real RDKit-backed implementation
  * would swap in behind the same trait without touching any pipeline.
  */
trait ChemBackend extends Serializable {

  /** Column expression producing the product mass for (substrateMass, rule
    * mass delta). Null = the rule does not apply. */
  def productMass(substrateMass: Column, ruleDelta: Column): Column

  /** Deterministic product identity (the reference canonicalizes SMILES;
    * gizmos.py:294-327). */
  def productKey(rootId: Column, ruleId: Column, mass: Column): Column

  /** Expand substrates × applicable rules into virtual product rows —
    * the RunReactant Generator (gizmos.py:193-234). `rules` must be small
    * (it is broadcast). */
  def virtualProducts(substrates: DataFrame, rules: DataFrame,
                      idCol: String, massCol: String, rootCol: String,
                      ruleIdCol: String = "rule_id",
                      ruleDeltaCol: String = "mass_delta"): DataFrame = {
    val prods = substrates.crossJoin(broadcast(rules))
      .withColumn("product_mass", productMass(col(massCol), col(ruleDeltaCol)))
      .where(col("product_mass").isNotNull && col("product_mass") > 0)
    prods.withColumn("product_id",
        productKey(col(rootCol), col(ruleIdCol), col("product_mass")))
      .select(col(idCol).as("substrate_id"), col(ruleIdCol),
        col("product_id"), col("product_mass"), col(rootCol).as("root"))
  }
}

/** Default backend: pure mass arithmetic, md5-derived product keys —
  * reproducible everywhere, zero native deps. */
object MassOnlyBackend extends ChemBackend {
  override def productMass(substrateMass: Column, ruleDelta: Column): Column =
    substrateMass + ruleDelta

  override def productKey(rootId: Column, ruleId: Column, mass: Column): Column =
    concat(lit("VM_"), substring(md5(concat(
      rootId.cast("string"), lit(":"), ruleId.cast("string"),
      lit(":"), round(mass, 4).cast("string"))), 1, 7))
}
