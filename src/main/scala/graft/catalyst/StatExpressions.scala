package graft.catalyst

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import graft.stats.Dist

/** Native Catalyst expressions for the statistical tail functions the
  * engine needs in hot aggregate finishers (corr p-values, LRT p, Fisher
  * p, outlier densities). These are the one scalar surface SQL lacks
  * (SURVEY §7.2.1); as codegen'd expressions they stay inside whole-stage
  * codegen instead of breaking the span the way a Scala UDF does — the
  * generated code calls the static [[graft.stats.Dist]] kernels directly.
  *
  * Inputs are pre-cast to double/long by the [[StatFunctions]] builders
  * and the [[GraftExtensions]] SQL registration.
  *
  * Registered for SQL via `spark.sql.extensions=graft.catalyst.GraftExtensions`:
  * `graft_pnorm`, `graft_chisq_tail`, `graft_t_tail2`, `graft_corr_p`.
  */
case class PNormExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pnorm"
  protected override def nullSafeEval(x: Any): Any =
    Dist.pnorm(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.stats.Dist.pnorm($c)")
  override protected def withNewChildInternal(newChild: Expression): PNormExpr =
    copy(child = newChild)
}

case class ChisqTailExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_chisq_tail"
  protected override def nullSafeEval(x: Any, df: Any): Any =
    Dist.chisqTail(x.asInstanceOf[Double], df.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, d) => s"graft.stats.Dist.chisqTail($x, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ChisqTailExpr =
    copy(left = l, right = r)
}

case class TTail2Expr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_t_tail2"
  protected override def nullSafeEval(t: Any, df: Any): Any =
    Dist.tTail2(t.asInstanceOf[Double], df.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) => s"graft.stats.Dist.tTail2($t, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TTail2Expr =
    copy(left = l, right = r)
}

case class CorrPValueExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_corr_p"
  protected override def nullSafeEval(r: Any, n: Any): Any =
    Dist.corrPValue(r.asInstanceOf[Double], n.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, n) => s"graft.stats.Dist.corrPValue($r, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CorrPValueExpr =
    copy(left = l, right = r)
}

/** Column-API face of the native expressions (explicit double/long casts
  * on the children replace ImplicitCastInputTypes, which is sql-private). */
object StatFunctions {
  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def d(col: Column): Expression =
    Cast(GraftColumnBridge.expression(col), DoubleType)
  private def l(col: Column): Expression =
    Cast(GraftColumnBridge.expression(col), LongType)

  def pnorm(x: Column): Column = c(PNormExpr(d(x)))
  def chisqTail(x: Column, df: Column): Column = c(ChisqTailExpr(d(x), d(df)))
  def tTail2(t: Column, df: Column): Column = c(TTail2Expr(d(t), d(df)))
  def corrPValue(r: Column, n: Column): Column = c(CorrPValueExpr(d(r), l(n)))
}

/** SparkSessionExtensions hook: makes the stat tails available to plain
  * SQL (`SELECT graft_corr_p(r, n) FROM ...`). Configure at startup with
  * `spark.sql.extensions=graft.catalyst.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session (REPL / notebook). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.catalyst", null, name, usage, "")
  private def dc(e: Expression) = Cast(e, DoubleType)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // auto range-join rewrite (opt-in via spark.graft.rangeJoin.bucketWidth)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    (GraftExtensions.statFns ++ GraftExtensions.arrayFns).foreach {
      case (n, u, b) =>
        ext.injectFunction((FunctionIdentifier(n), info(n, u), b))
    }
  }
}

object GraftExtensions {
  private def nArgs(es: Seq[Expression], n: Int, name: String): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${es.length}")

  /** Stat-tail SQL builders (name, usage, builder), shared by the
    * extension hook and [[register]]. */
  private[catalyst] val statFns: Seq[(String, String, Seq[Expression] => Expression)] = {
    def dc(e: Expression) = Cast(e, DoubleType)
    Seq(
      ("graft_pnorm", "standard normal CDF",
        (es: Seq[Expression]) => { nArgs(es, 1, "graft_pnorm")
          PNormExpr(dc(es(0))) }),
      ("graft_chisq_tail", "chi-square upper tail",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_chisq_tail")
          ChisqTailExpr(dc(es(0)), dc(es(1))) }),
      ("graft_t_tail2", "two-sided Student-t tail",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_t_tail2")
          TTail2Expr(dc(es(0)), dc(es(1))) }),
      ("graft_corr_p", "two-sided p of Pearson r over n obs",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_corr_p")
          CorrPValueExpr(dc(es(0)), Cast(es(1), LongType)) }))
  }

  /** Array-kernel SQL builders (name, usage, builder) — k / numHashes
    * arguments must be literals (they parameterize the generated code). */
  private[catalyst] val arrayFns: Seq[(String, String, Seq[Expression] => Expression)] = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, LongType => LT, StringType}
    def ac(e: Expression, et: org.apache.spark.sql.types.DataType) =
      Cast(e, ArrayType(et))
    def sc(e: Expression) = Cast(e, StringType)
    def litInt(e: Expression, what: String): Int = e match {
      case f if f.foldable =>
        f.eval() match {
          // integral literals only — a fractional 3.7 silently truncating
          // to k=3 would compute a shingle space the caller never asked for
          case n: java.lang.Integer => n.intValue()
          case n: java.lang.Long => n.intValue()
          case n: java.lang.Short => n.intValue()
          case n: java.lang.Byte => n.intValue()
          case other => throw new IllegalArgumentException(
            s"$what must be a non-null integer literal, got $other")
        }
      case _ => throw new IllegalArgumentException(s"$what must be a literal")
    }
    Seq(
      ("graft_jaccard_longs", "exact Jaccard of two BIGINT-array sets",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_jaccard_longs")
          JaccardLongsExpr(ac(es(0), LT), ac(es(1), LT)) }),
      ("graft_shingle_hashes", "distinct word-k-shingle 60-bit md5 hashes",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_shingle_hashes")
          ShingleHashesExpr(sc(es(0)), litInt(es(1), "k")) }),
      ("graft_minhash_sig", "minhash signature (k-shingles, n hashes)",
        (es: Seq[Expression]) => { nArgs(es, 3, "graft_minhash_sig")
          MinhashSigExpr(sc(es(0)), litInt(es(1), "k"), litInt(es(2), "numHashes")) }),
      ("graft_simhash_sig", "60-bit simhash sketch over lowercased k-shingles",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_simhash_sig")
          SimhashSigExpr(sc(es(0)), litInt(es(1), "k")) }),
      ("graft_rolling_hash", "order-sensitive 64-bit polynomial hash of UTF-8 bytes",
        (es: Seq[Expression]) => { nArgs(es, 1, "graft_rolling_hash")
          RollingHashExpr(sc(es(0))) }),
      ("graft_nfc", "Unicode NFC canonical composition",
        (es: Seq[Expression]) => { nArgs(es, 1, "graft_nfc")
          NfcNormalizeExpr(sc(es(0))) }),
      ("graft_strip_accents", "remove combining marks after NFD decomposition",
        (es: Seq[Expression]) => { nArgs(es, 1, "graft_strip_accents")
          StripAccentsExpr(sc(es(0))) }),
      ("graft_dot_f", "float-vector dot product in double",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_dot_f")
          DotFExpr(ac(es(0), FloatType), ac(es(1), FloatType)) }),
      ("graft_cosine_f", "float-vector cosine similarity",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_cosine_f")
          CosineFExpr(ac(es(0), FloatType), ac(es(1), FloatType)) }),
      ("graft_inter_longs", "exact intersection size of two BIGINT-array sets",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_inter_longs")
          InterLongsExpr(ac(es(0), LT), ac(es(1), LT)) }),
      ("graft_kmv_sketch", "k smallest distinct BIGINT hashes (aggregate)",
        (es: Seq[Expression]) => { nArgs(es, 2, "graft_kmv_sketch")
          KmvSketchAgg(Cast(es(0), LT), litInt(es(1), "k"))
            .toAggregateExpression() }))
  }

  /** Register the graft_* SQL functions on an already-running session
    * (spark.sql.extensions only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    val reg = spark.sessionState.functionRegistry
    def info(name: String, usage: String) =
      new ExpressionInfo("graft.catalyst", null, name, usage, "")
    (statFns ++ arrayFns).foreach { case (n, u, b) =>
      reg.registerFunction(FunctionIdentifier(n), info(n, u), b)
    }
  }
}
