package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for per-document text statistics that need a frequency
  * map (which built-in higher-order functions can't build without an
  * O(tokens²) `filter`-inside-`aggregate` scan, and a Scala UDF would pay
  * the per-row encoder tax documented in [[ArrayKernels]]).
  *
  * The repetition kernel is one linear pass per document with per-row
  * state bounded by the document's own token count — the row-local,
  * zero-shuffle shape a 100 TB quality-filter pass needs (the
  * explode-and-groupBy alternative shuffles the full token stream of the
  * corpus to compute a per-document number). */
object TextKernels {

  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  /** Gopher-style in-document repetition counts over whitespace tokens:
    * (n_tokens, max 2-gram multiplicity, max 3-gram multiplicity,
    * distinct 5-gram count). Gram universes are the n-k+1 overlapping
    * word windows joined by single spaces (no short-document fallback:
    * a doc with fewer than k tokens simply has zero k-grams). Counting
    * is exact over gram STRINGS, so a SQL oracle reproduces it with
    * unnest + GROUP BY verbatim. */
  def repetitionStats(t: UTF8String): InternalRow = {
    val toks = wsPattern.split(t.toString).filter(_.nonEmpty)
    val n = toks.length
    def topCount(k: Int): Int = {
      if (n < k) return 0
      val m = new java.util.HashMap[String, Int]()
      var best = 0
      var i = 0
      while (i <= n - k) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val c = m.merge(sb.toString, 1, Integer.sum)
        if (c > best) best = c
        i += 1
      }
      best
    }
    def distinctCount(k: Int): Int = {
      if (n < k) return 0
      val set = new java.util.HashSet[String]()
      var i = 0
      while (i <= n - k) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        set.add(sb.toString)
        i += 1
      }
      set.size
    }
    new GenericInternalRow(Array[Any](n, topCount(2), topCount(3), distinctCount(5)))
  }
}

/** Struct-returning codegen expression over [[TextKernels.repetitionStats]]:
  * stays inside the whole-stage span (the kernel call is a plain static
  * method on the generated class path, like every [[ArrayKernels]] wrapper). */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def prettyName: String = "graft_repetition_stats"
  protected override def nullSafeEval(t: Any): Any =
    TextKernels.repetitionStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.TextKernels.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("top2_count", IntegerType, nullable = false),
    StructField("top3_count", IntegerType, nullable = false),
    StructField("distinct_5grams", IntegerType, nullable = false)))
}

/** Unicode canonicalization kernels: NFC composition and accent
  * stripping (NFD + combining-mark removal). Standard corpus-cleaning
  * passes Spark has no built-in for; pure row-local codegen, zero
  * shuffle. Semantics mirror DuckDB's nfc_normalize / strip_accents
  * (the oracle functions) on the covered cases. */
object UnicodeKernels {
  import java.text.Normalizer

  def nfc(t: UTF8String): UTF8String = {
    val s = t.toString
    // fast path: already-NFC text (all ASCII trivially is) skips the copy
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) t
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  private val combining = java.util.regex.Pattern.compile("\\p{M}+")

  def stripAccents(t: UTF8String): UTF8String = {
    val d = Normalizer.normalize(t.toString, Normalizer.Form.NFD)
    val out = combining.matcher(d).replaceAll("")
    if (out == t.toString) t else UTF8String.fromString(out)
  }
}

case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_nfc"
  protected override def nullSafeEval(t: Any): Any =
    UnicodeKernels.nfc(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.UnicodeKernels.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_strip_accents"
  protected override def nullSafeEval(t: Any): Any =
    UnicodeKernels.stripAccents(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.UnicodeKernels.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

/** Column-API face of the text kernels. */
object TextFunctions {
  def repetitionStats(text: Column): Column =
    GraftColumnBridge.column(RepetitionStatsExpr(GraftColumnBridge.expression(text)))
  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(text)))
  def stripAccents(text: Column): Column =
    GraftColumnBridge.column(StripAccentsExpr(GraftColumnBridge.expression(text)))
}
