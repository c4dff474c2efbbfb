package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus profiling — the heavy-hitter
  * complement of the KMV distinct sketch (`q_kmv_distinct`): KMV answers
  * "how many distinct", count-min answers "how often does THIS item
  * occur" with a fixed-size summary, the 100 TB shape for token/domain
  * frequency monitoring where a full vocabulary aggregate is unwanted
  * per slice.
  *
  * Determinism discipline (shared with every md5-draw operator in this
  * repo): the row hashes are 60-bit md5 draws of `"cms<seed>:<row>:" ++
  * item`, so the sketch — and therefore every point estimate — is a pure
  * function of (data, seed, depth, width) that a DuckDB oracle replays
  * bit for bit. No random state, no stream-order dependence (unlike
  * Misra–Gries, whose content depends on arrival order and is therefore
  * NOT oracle-replayable — count-min is the right sketch for a
  * deterministic engine).
  */
object Sketches {

  private def bucket(item: Column, r: Int, width: Int, seed: Long): Column =
    conv(substring(md5(concat(lit(s"cms$seed:$r:"), item.cast("string"))),
      1, 15), 16, 10).cast("long") % width

  /** Build a depth×width count-min sketch over every row of `itemCol`
    * (one increment per OCCURRENCE). Output relation (r, bucket, c) has
    * at most depth·width rows regardless of input size.
    *
    * Shape: each row fans out to `depth` (r, bucket) cells (bounded
    * constant fan-out), then ONE aggregate with map-side partial combine
    * collapses the corpus to the cell grid — the classic sketch build:
    * linear scan, tiny shuffle (≤ depth·width partial rows per task). */
  def cmsBuild(items: DataFrame, itemCol: String,
               depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch dims: $depth x $width")
    items.select(posexplode(array((0 until depth).map(r =>
        bucket(col(itemCol), r, width, seed)): _*)))
      .toDF("r", "bucket")
      .groupBy("r", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Sketches are mergeable cell-wise — union the cell relations and sum.
    * Both inputs must share (depth, width, seed); the caller owns that
    * contract (persisted sketches should store the params alongside). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "bucket").agg(sum(col("c")).as("c"))

  /** Point-frequency estimates for `queries` (one row per distinct item):
    * est = min over rows r of the item's cell count — the count-min
    * guarantee est ≥ true, with overshoot bounded by collisions. The
    * sketch side is tiny (≤ depth·width cells) and broadcasts; the query
    * side never shuffles. */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
                  depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch dims: $depth x $width")
    val cells = queries.select(col(itemCol),
        posexplode(array((0 until depth).map(r =>
          bucket(col(itemCol), r, width, seed)): _*)))
      .toDF(itemCol, "r", "bucket")
    cells.join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}
