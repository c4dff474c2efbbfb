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
    * side's whole row content, not rand().
    *
    * Matched pairs appear exactly once for every `how` (a big row carries
    * one salt, so it meets exactly one replica of its partner). The one
    * salting artifact is outer-side duplication: an UNMATCHED small row
    * matches no shard and would surface once per replica under
    * right/full-outer. Those rows are identified by a marker column on the
    * big side (its own columns may legitimately be NULL, the marker can't)
    * and kept from shard 0 only, so the output is identical to the
    * unsalted join for every supported `how`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 shards: Int = 16, how: String = "inner"): DataFrame = {
    require(shards > 0, "shards must be positive")
    val norm = how.toLowerCase.replace("_", "")
    val outerSmall = Set("right", "rightouter", "full", "fullouter", "outer")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(shards)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(shards.toLong - 1))))
    if (!outerSmall.contains(norm)) {
      salted.join(replicated, Seq(key, "__salt"), how).drop("__salt")
    } else {
      val joined = salted.withColumn("__big", lit(1))
        .join(replicated, Seq(key, "__salt"), how)
      joined.filter(col("__big").isNotNull || col("__salt") === 0)
        .drop("__salt", "__big")
    }
  }
}
