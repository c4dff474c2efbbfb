package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting.
  *
  * The reference's hot keys are the degenerate rounded mass-transition
  * values (treatMassTransitions.py:56-59 plots exactly this degeneracy):
  * a handful of rounded masses carry a large share of rows, so a shuffle
  * join stalls on a few straggler partitions. AQE's skew-join handles
  * sort-merge cases automatically; this utility is the explicit form for
  * when the planner can't (e.g. aggregation-free pipelines, or engines
  * with AQE off): the big side's key is salted with a deterministic
  * hash-derived shard, the small side is replicated across all shards,
  * and the join output is provably identical to the unsalted join.
  */
object Skew {

  /** Equi-join `big` ⨝ `small` on `key` with the big side spread over
    * `shards` salted sub-keys. `small` grows by the shard factor — keep
    * shards modest (8-32). Deterministic: the salt is a hash of the big
    * side's whole row content, not rand(). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 shards: Int = 16, how: String = "inner"): DataFrame = {
    require(shards > 0, "shards must be positive")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(shards)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(shards.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt"), how).drop("__salt")
  }
}
