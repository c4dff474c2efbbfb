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

  /** One-pass per-document quality statistics — the integer inputs of
    * Text.qualityFeatures, computed in a single linear scan. The
    * declarative form pays Spark's higher-order-function CodegenFallback
    * (filter/aggregate/transform are interpreted per row — measured ~17×
    * the codegen cost on a 500k-doc materialization); this kernel is a
    * plain static-path call inside the whole-stage span.
    *
    * Bit-parity contract with the declarative pipeline (property-tested):
    * chars/token lengths are CODE POINTS (Spark `length`), punct counts
    * code points outside [A-Za-z0-9] and Java-regex `\s` (the
    * `[^A-Za-z0-9\s]` match count), tokens are `\s+` splits with empties
    * dropped, the stopword test lowercases through UTF8String.toLowerCase
    * (Spark `lower`), distinct is raw-token value equality. */
  def qualityStats(t: UTF8String,
                   stopwords: java.util.HashSet[String]): InternalRow = {
    val s = t.toString
    var punct = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val alnum = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9')
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (!alnum && !ws) punct += 1
      i += Character.charCount(cp)
    }
    val toks = wsPattern.split(s).filter(_.nonEmpty)
    var sumLen = 0L
    var hits = 0
    val uniq = new java.util.HashSet[String]()
    var j = 0
    while (j < toks.length) {
      val tok = toks(j)
      sumLen += tok.codePointCount(0, tok.length)
      val low = UTF8String.fromString(tok).toLowerCase.toString
      if (stopwords.contains(low)) hits += 1
      uniq.add(tok)
      j += 1
    }
    new GenericInternalRow(Array[Any](t.numChars(), toks.length, punct,
      sumLen, hits, uniq.size))
  }

  private val nlPattern = java.util.regex.Pattern.compile("\n")

  /** Spark `trim` semantics: strip ' ' (0x20) from both ends only. */
  private def sparkTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** One-pass Gopher-rule statistics (see [[GopherStatsExpr]]). */
  def gopherStats(t: UTF8String,
                  stopwords: java.util.HashSet[String]): InternalRow = {
    val s = t.toString
    val toks = wsPattern.split(s).filter(_.nonEmpty)
    var chars = 0L
    var alpha = 0
    var symbol = 0
    val matched = new java.util.HashSet[String]()
    var j = 0
    while (j < toks.length) {
      val tok = toks(j)
      chars += tok.codePointCount(0, tok.length)
      var hasLetter = false
      var i = 0
      while (!hasLetter && i < tok.length) {
        val c = tok.charAt(i)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasLetter = true
        i += 1
      }
      if (hasLetter) alpha += 1
      if (tok.startsWith("#") || tok.contains("…") || tok.contains("..."))
        symbol += 1
      val low = UTF8String.fromString(tok).toLowerCase.toString
      if (stopwords.contains(low)) matched.add(low)
      j += 1
    }
    var nLines = 0
    var bullet = 0
    var ellipsis = 0
    val lines = nlPattern.split(s, -1)
    var k = 0
    while (k < lines.length) {
      val tl = sparkTrim(lines(k))
      if (tl.nonEmpty) {
        nLines += 1
        val c0 = tl.charAt(0)
        if (c0 == '-' || c0 == '*' || c0 == '•') bullet += 1
        if (tl.endsWith("...") || tl.endsWith("…")) ellipsis += 1
      }
      k += 1
    }
    new GenericInternalRow(Array[Any](toks.length, chars, alpha, symbol,
      nLines, bullet, ellipsis, matched.size))
  }
}

/** Struct-returning codegen expression over [[TextKernels.gopherStats]] —
  * the integer inputs of Text.gopherRules in one linear pass (same HOF-
  * fallback motivation as [[QualityStatsExpr]]). Bit-parity contract
  * (property-tested): words are `\s+` splits (empties dropped), lines are
  * `\n` splits whose Spark-`trim` (space-stripped) form is non-empty,
  * word predicates are contains-letter / starts-with-'#' / contains '…'
  * or '...', line predicates test the trimmed first char ∈ {-,*,•} and
  * trimmed suffix '...' or '…', and stopword hits count DISTINCT lowered
  * words present in the list (array_intersect semantics). */
case class GopherStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = GopherStatsExpr.schema
  override def prettyName: String = "graft_gopher_stats"
  // Declared NON-deterministic on purpose (it is pure): the optimizer
  // substitutes filter predicates through projections, so a consumer
  // filtering on a derived column (`.where(col("pass"))`) inlines this
  // whole-document tokenization kernel once PER CONJUNCT into a Filter —
  // measured 23 copies in q_pipeline_quality_mix's pushed filter, ~13x
  // the single-evaluation cost, because FilterExec's split conjuncts get
  // no subexpression elimination (ProjectExec's CSE is why the same
  // inlining is harmless in q_gopher_rules). The nondeterministic flag
  // is the optimization guide's sanctioned fix for exactly this
  // duplication (§4.4): the kernel stays in its own Project, evaluated
  // once per row, at every scale. Correctness is unaffected — a pure
  // expression is valid under any evaluation count or order.
  override lazy val deterministic: Boolean = false
  @transient private lazy val set: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    stopwords.foreach(h.add)
    h
  }
  def kernel(t: UTF8String): InternalRow = TextKernels.gopherStats(t, set)
  protected override def nullSafeEval(t: Any): Any =
    kernel(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherStats", this)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("chars", org.apache.spark.sql.types.LongType,
      nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("symbol", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("bullet", IntegerType, nullable = false),
    StructField("ellipsis", IntegerType, nullable = false),
    StructField("stopword_hits", IntegerType, nullable = false)))
}

/** Struct-returning codegen expression over [[TextKernels.qualityStats]];
  * the stopword list rides the expression (content equality via the case
  * class) and is materialized into a HashSet once per (de)serialized
  * instance. */
case class QualityStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = QualityStatsExpr.schema
  override def prettyName: String = "graft_quality_stats"
  // pure but declared nondeterministic — see GopherStatsExpr: blocks the
  // per-conjunct filter-pushdown inlining of the tokenization kernel
  // (quality/lang gates filter on columns derived from this struct)
  override lazy val deterministic: Boolean = false
  @transient private lazy val set: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    stopwords.foreach(h.add)
    h
  }
  def kernel(t: UTF8String): InternalRow = TextKernels.qualityStats(t, set)
  protected override def nullSafeEval(t: Any): Any =
    kernel(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityStats", this)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

object QualityStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("sum_tok_len", org.apache.spark.sql.types.LongType,
      nullable = false),
    StructField("stopword_hits", IntegerType, nullable = false),
    StructField("uniq_tokens", IntegerType, nullable = false)))
}

/** Struct-returning codegen expression over [[TextKernels.repetitionStats]]:
  * stays inside the whole-stage span (the kernel call is a plain static
  * method on the generated class path, like every [[ArrayKernels]] wrapper). */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def prettyName: String = "graft_repetition_stats"
  // pure but declared nondeterministic — see GopherStatsExpr: Gopher-
  // style repetition gates filter on ratios derived from this struct
  override lazy val deterministic: Boolean = false
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
  def qualityStats(text: Column, stopwords: Seq[String]): Column =
    GraftColumnBridge.column(
      QualityStatsExpr(GraftColumnBridge.expression(text), stopwords))
  def gopherStats(text: Column, stopwords: Seq[String]): Column =
    GraftColumnBridge.column(
      GopherStatsExpr(GraftColumnBridge.expression(text), stopwords))
  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(GraftColumnBridge.expression(text)))
  def stripAccents(text: Column): Column =
    GraftColumnBridge.column(StripAccentsExpr(GraftColumnBridge.expression(text)))
}
