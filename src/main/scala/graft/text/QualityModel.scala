package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier: logistic regression
  * y ~ 1 + x1 + x2 fit by DISTRIBUTED IRLS — the learned upgrade of the
  * heuristic `Text.qualityScore` (the fastText-classifier role in a
  * pre-training pipeline: fit on a labeled slice, score the corpus).
  *
  * Distributed shape: each IRLS iteration is ONE aggregate producing the
  * nine weighted moment sums (map-side partial combine; the corpus never
  * leaves its partitions), then a driver-side Cramer 3×3 solve of the
  * normal equations — the classic "Gramian to the driver" pattern that
  * scales to any row count because driver state is 9 numbers.
  *
  * Cross-engine determinism (the `olsTwoCovariatesExact` +
  * `Clustering.kmeansAssign` recipe combined): features, per-row IRLS
  * weights and working responses are quantized onto the 1e-6 grid, the
  * weighted moments are EXACT decimal sums of grid-value products
  * (decimal(7,6) × decimal(7,6) × decimal(14,6) = decimal(28,18), within
  * the 38-digit cap — order-independent, bit-identical in any engine),
  * doubles are recovered via the decimal STRING, and the solve is a
  * fixed IEEE expression tree the oracle mirrors token for token. The
  * only transcendental is exp() inside the sigmoid; its cross-engine ulp
  * drift is absorbed by the 1e-6 quantization grid (the lmScore /
  * q_dist_shift precedent).
  */
object QualityModel {

  /** 1e-6 grid quantizer (identical to the kmeans/ComBat kernels). */
  private def gq(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  final case class Coeffs(b0: Double, b1: Double, b2: Double)

  /** The shared feature/label frame: x1 = min(n_tokens, 200)/200 (exact
    * terminating division), x2 = grid-quantized distinct-token ratio,
    * y = 1 when `lang` equals `posLang`. */
  def features(df: DataFrame, idCol: String, textCol: String,
               langCol: String, posLang: String): DataFrame = {
    val toks = Text.tokens(lower(col(textCol)))
    df.select(col(idCol).as("id"),
        when(col(langCol) === posLang, 1.0).otherwise(0.0).as("y"),
        (least(size(toks).cast("double"), lit(200.0)) / lit(200.0)).as("x1"),
        gq(size(array_distinct(toks)).cast("double") /
          size(toks).cast("double")).as("x2"))
      .where(col("x2").isNotNull) // empty docs carry no ratio
  }

  /** Fit exactly `iters` IRLS iterations from beta = 0 and return the
    * coefficient path (the caller usually keeps the last row). Driver
    * state per iteration: the nine moment sums. */
  def irlsFit(feats: DataFrame, iters: Int): Seq[Coeffs] = {
    require(iters >= 1, "iters must be positive")
    val d6 = "decimal(7,6)"   // w in [0, 0.25], x in [0, 1]
    val dz = "decimal(14,6)"  // z bounded by the w >= 1e-6 clamp
    def s(e: Column) = sum(e).cast("string").cast("double")
    var b = Coeffs(0.0, 0.0, 0.0)
    val path = scala.collection.mutable.Buffer[Coeffs]()
    var it = 0
    while (it < iters) {
      val eta = lit(b.b0) + lit(b.b1) * col("x1") + lit(b.b2) * col("x2")
      val muRaw = lit(1.0) / (lit(1.0) + exp(-eta))
      val mu = gq(least(greatest(muRaw, lit(1e-6)), lit(0.999999)))
      val w = greatest(gq(mu * (lit(1.0) - mu)), lit(1e-6))
      val z = gq(eta + (col("y") - mu) / w)
      val m = feats
        .select(w.cast(d6).as("w"), col("x1").cast(d6).as("u1"),
          col("x2").cast(d6).as("u2"), z.cast(dz).as("zz"))
        .agg(
          s(col("w")).as("sw"),
          s(col("w") * col("u1")).as("s1"),
          s(col("w") * col("u2")).as("s2"),
          s(col("w") * col("u1") * col("u1")).as("s11"),
          s(col("w") * col("u2") * col("u2")).as("s22"),
          s(col("w") * col("u1") * col("u2")).as("s12"),
          s(col("w") * col("zz")).as("sy"),
          s(col("w") * col("u1") * col("zz")).as("s1y"),
          s(col("w") * col("u2") * col("zz")).as("s2y"))
        .collect()(0)
      // an empty (or fully filtered) training frame sums to NULL —
      // raise a clear error instead of the opaque NPE getDouble throws
      require(!m.isNullAt(0),
        "irlsFit: empty training set (no rows survived the feature " +
          "projection) — cannot fit a quality classifier")
      val Seq(sw, s1, s2, s11, s22, s12, sy, s1y, s2y) =
        (0 until 9).map(m.getDouble)
      // Cramer expansions in the olsTwoCovariatesExact token order (the
      // oracle mirrors this association exactly)
      val det = sw * (s11 * s22 - s12 * s12) -
        s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
      val det0 = sy * (s11 * s22 - s12 * s12) -
        s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
      val det1 = sw * (s1y * s22 - s12 * s2y) -
        sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
      val det2 = sw * (s11 * s2y - s1y * s12) -
        s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
      // reject near-singular systems relative to the moment magnitudes,
      // not just exact zero — a determinant at rounding-noise scale
      // would silently emit garbage coefficients
      val detScale = math.max(math.abs(sw * s11 * s22), 1e-300)
      require(math.abs(det) > 1e-12 * detScale,
        s"irlsFit: (near-)singular IRLS system (|det|=${math.abs(det)} " +
          s"vs moment scale $detScale) — features are collinear or " +
          "degenerate")
      b = Coeffs(det0 / det, det1 / det, det2 / det)
      path += b
      it += 1
    }
    path.toSeq
  }

  /** Per-document scores under the final coefficients: (id, y, score,
    * pred) with score = sigmoid(eta) rounded 6 — one zero-shuffle scan. */
  def score(feats: DataFrame, b: Coeffs): DataFrame = {
    val eta = lit(b.b0) + lit(b.b1) * col("x1") + lit(b.b2) * col("x2")
    feats.select(col("id"), col("y"),
      round(lit(1.0) / (lit(1.0) + exp(-eta)), 6).as("score"),
      (lit(1.0) / (lit(1.0) + exp(-eta)) >= 0.5).as("pred"))
  }

  /** Quality-threshold tradeoff curve — "what do we keep at each
    * cutoff?": for every candidate threshold k/bins the report carries
    * how many docs and how much token mass survive `score >= threshold`
    * and their corpus shares — the quantity-vs-quality pareto view that
    * picks the filter cutoff.
    *
    * Determinism: scores quantize once to integer micro-units, docs
    * land in equal-width bins, and the curve is a REVERSE cumulative
    * BIGINT sum over the bins relation; shares are single divisions,
    * rounded at 6. Scale shape: one map-side-combined aggregate to
    * `bins` rows, then windows over those rows.
    *
    * @return (threshold, docs_kept, tokens_kept, doc_share, token_share) */
  def qualityTradeoffCurve(scored: DataFrame, scoreCol: String,
                           tokensCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must divide 1e6 for exact integer binning: $bins")
    val width = 1000000L / bins
    val u = floor(col(scoreCol) * 1e6 + 0.5).cast("long")
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").asc)
    val tail = ord.rowsBetween(0, Long.MaxValue)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    scored
      .select(least(floor(u / lit(width)), lit(bins - 1L)).cast("int")
          .as("bin"),
        col(tokensCol).cast("long").as("toks"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("toks")).as("tok"))
      .withColumn("docs_kept", sum(col("n")).over(tail))
      .withColumn("tokens_kept", sum(col("tok")).over(tail))
      .withColumn("tot_n", sum(col("n")).over(all))
      .withColumn("tot_tok", sum(col("tok")).over(all))
      .select(
        round(col("bin").cast("double") / bins, 6).as("threshold"),
        col("docs_kept"), col("tokens_kept"),
        round(col("docs_kept").cast("double") / col("tot_n"), 6)
          .as("doc_share"),
        round(col("tokens_kept").cast("double") / col("tot_tok"), 6)
          .as("token_share"))
  }

  /** Reliability / calibration report over a scored frame — the ML-ops
    * check behind every learned quality filter: does a 0.8 score mean
    * 80% of such docs are actually positive? Scores land in `bins`
    * equal-width probability bins; each bin reports its size, mean
    * score, empirical positive rate, and |gap|; every row also carries
    * the expected calibration error ECE = Σ_b (n_b/N)·|gap_b|.
    *
    * Determinism contract: the score is converted ONCE to exact integer
    * micro-units u = floor(s·10⁶ + 0.5) (the grid recipe — s is already
    * on the 1e-6 grid, so this is lossless); binning is integer
    * division of u, every aggregate (Σu, Σy, Σ|u − 10⁶y... per bin
    * |Σu − 10⁶·pos|) is a BIGINT, and each reported double is ONE
    * division of exact integers + round(.,6) — no order-dependent float
    * sum anywhere, so a SQL oracle replays bit for bit. In particular
    * ECE's numerator Σ_b |Σu_b − 10⁶·pos_b| is itself an exact BIGINT.
    *
    * Scale shape: one map-side-combined aggregate to `bins` rows, then
    * a single-task window over those rows. */
  def calibrationReport(scored: DataFrame, scoreCol: String,
                        labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 2 && 1000000 % bins == 0,
      s"bins must divide 1e6 for exact integer binning: $bins")
    val width = 1000000L / bins
    val u = floor(col(scoreCol) * 1e6 + 0.5).cast("long")
    val perBin = scored
      .select(least(floor(u / lit(width)), lit(bins - 1L)).cast("int")
          .as("bin"),
        u.as("u"), col(labelCol).cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("u")).as("sum_micro"),
        sum(col("y")).as("positives"))
      .withColumn("dev", abs(col("sum_micro") - col("positives") * 1000000L))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    perBin
      .withColumn("tot_n", sum(col("n")).over(all))
      .withColumn("tot_dev", sum(col("dev")).over(all))
      .select(col("bin"), col("n"), col("sum_micro"), col("positives"),
        round(col("sum_micro").cast("double") /
          (col("n") * 1000000L), 6).as("avg_score"),
        round(col("positives").cast("double") / col("n"), 6).as("pos_rate"),
        round(col("dev").cast("double") /
          (col("n") * 1000000L), 6).as("gap"),
        round(col("tot_dev").cast("double") /
          (col("tot_n") * 1000000L), 6).as("ece"))
  }
}
