package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the array-heavy dedup/similarity
  * kernels (shingle hashing, minhash/simhash sketches, exact Jaccard,
  * float-vector dot/cosine).
  *
  * Why these are expressions and not Scala UDFs: a `udf((a: Seq[Long],
  * b: Seq[Long]) => ...)` pays an ExpressionEncoder deserialization per
  * ROW per ARGUMENT (SpecificSafeProjection.MapObjects — element-wise
  * boxing into an immutable Seq). Profiled on the n-gram verify join at
  * sf0.1 that converter was ~99% of the stage's CPU: 118k candidate pairs
  * × two ~50-element arrays burned ~100 s of CPU before the actual
  * jaccard merge (microbenchmark: the merge itself is ~0.1 s). The same
  * tax hits every array-returning UDF (minhash signatures) and every
  * float-vector UDF (cosine scoring joins). These expressions read the
  * Tungsten [[ArrayData]] directly — `toLongArray`/`toFloatArray` are
  * single primitive bulk copies, no boxing, no encoder — and stay inside
  * whole-stage codegen via `doGenCode`, so the surrounding join/filter
  * span is not broken the way a ScalaUDF node breaks it. */
object ArrayKernels {

  /** `toLongArray`/`toFloatArray` raw-copy the value region and would
    * silently coerce null ELEMENTS to 0 (a wrong similarity, not an
    * error) — the former Seq-typed UDFs failed loudly instead. The SQL
    * builders cast with containsNull allowed, so guard here. One
    * `isNullAt` bit-test per element is noise next to the sort/dot the
    * kernels then do. */
  private def checkNoNulls(a: ArrayData, fn: String): ArrayData = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$fn: null array element at position $i (null elements are not supported)")
      i += 1
    }
    a
  }

  /** Exact Jaccard of two long-hash sets ([[graft.dedup.Dedup.jaccardLongs]]
    * semantics: local sorted copies, two-pointer merge; empty∩empty = NaN
    * which every >= threshold predicate rejects). */
  def jaccardLongs(a: ArrayData, b: ArrayData): Double = {
    val x = checkNoNulls(a, "graft_jaccard_longs").toLongArray()
    val y = checkNoNulls(b, "graft_jaccard_longs").toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    inter.toDouble / (x.length + y.length - inter)
  }

  /** Distinct word-k-shingle 60-bit md5 hashes of a text (delegates to the
    * [[graft.dedup.Dedup.shingleHashes]] kernel — identical output). */
  def shingleHashes(t: UTF8String, k: Int): ArrayData =
    new GenericArrayData(graft.dedup.Dedup.shingleHashesKernel(
      if (t == null) null else t.toString, k))

  /** MinHash signature (double-hashing family over md5-derived base
    * hashes — [[graft.dedup.Dedup.minhashSigKernel]]). */
  def minhashSig(t: UTF8String, k: Int, n: Int): ArrayData =
    new GenericArrayData(graft.dedup.Dedup.minhashSigKernel(
      if (t == null) null else t.toString, k, n))

  /** 60-bit SimHash sketch over lowercased k-shingles
    * ([[graft.dedup.Dedup.simhashSigKernel]]). */
  def simhashSig(t: UTF8String, k: Int): Long =
    graft.dedup.Dedup.simhashSigKernel(if (t == null) null else t.toString, k)

  /** Positional word-k-gram 60-bit md5 hashes (lowercased; delegates to
    * [[graft.dedup.Dedup.tokenGramHashesKernel]]) — element i hashes
    * tokens [i, i+k). The substring-dedup tier posexplodes this so its
    * exchanges carry longs, never the gram text. */
  def tokenGramHashes(t: UTF8String, k: Int): ArrayData =
    new GenericArrayData(graft.dedup.Dedup.tokenGramHashesKernel(
      if (t == null) null else t.toString, k))

  /** Winnowing-selected fingerprint hashes (sorted distinct window
    * minima of the positional gram-hash stream; delegates to
    * [[graft.dedup.Dedup.winnowHashesKernel]]). */
  def winnowHashes(t: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(graft.dedup.Dedup.winnowHashesKernel(
      if (t == null) null else t.toString, k, w))

  /** Order-sensitive 64-bit rolling (polynomial) hash over the UTF-8
    * bytes: h = h*1000003 + byte, wrapping mod 2^64, FNV offset basis as
    * seed — bit-identical to the former `String`-typed UDF in
    * [[graft.text.Text.rollingHash]], but reading the UTF8String's bytes
    * directly (no String decode per row, no ScalaUDF node breaking the
    * codegen span). */
  def rollingHash(t: UTF8String): Long = {
    val bytes = t.getBytes
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  /** Float-vector dot product accumulated left-to-right in double —
    * bit-identical to the former Seq[Float] UDF. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val x = checkNoNulls(a, "graft_dot_f").toFloatArray()
    val y = checkNoNulls(b, "graft_dot_f").toFloatArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  /** Exact intersection size of two long-hash sets — same two-pointer
    * merge as [[jaccardLongs]] but returning the raw count, the
    * numerator an asymmetric CONTAINMENT score divides by one side's
    * size (|A∩B|/|A|). */
  def interLongs(a: ArrayData, b: ArrayData): Long = {
    val x = checkNoNulls(a, "graft_inter_longs").toLongArray()
    val y = checkNoNulls(b, "graft_inter_longs").toLongArray()
    java.util.Arrays.sort(x); java.util.Arrays.sort(y)
    var i = 0; var j = 0; var inter = 0L
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    inter
  }

  /** cosine(a,b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) computed
    * in ONE pass over ONE pair of primitive copies. Each accumulator adds
    * the same terms in the same left-to-right order as three separate
    * [[dotF]] calls, so the IEEE result is bit-identical to the composed
    * form (which the SRP-LSH DuckDB oracle replays literally). */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val x = checkNoNulls(a, "graft_cosine_f").toFloatArray()
    val y = checkNoNulls(b, "graft_cosine_f").toFloatArray()
    val n = math.min(x.length, y.length)
    var d = 0.0; var i = 0
    while (i < n) { d += x(i).toDouble * y(i).toDouble; i += 1 }
    // norms run over each vector's own full length, exactly like dot(a,a)
    var na = 0.0; i = 0
    while (i < x.length) { na += x(i).toDouble * x(i).toDouble; i += 1 }
    var nb = 0.0; i = 0
    while (i < y.length) { nb += y(i).toDouble * y(i).toDouble; i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class JaccardLongsExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_longs"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.jaccardLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.ArrayKernels.jaccardLongs($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardLongsExpr =
    copy(left = l, right = r)
}

case class InterLongsExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_inter_longs"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.interLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.ArrayKernels.interLongs($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterLongsExpr =
    copy(left = l, right = r)
}

case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  protected override def nullSafeEval(t: Any): Any =
    ArrayKernels.shingleHashes(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.ArrayKernels.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class MinhashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  protected override def nullSafeEval(t: Any): Any =
    ArrayKernels.minhashSig(t.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.ArrayKernels.minhashSig($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

case class SimhashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"
  protected override def nullSafeEval(t: Any): Any =
    ArrayKernels.simhashSig(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.ArrayKernels.simhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): SimhashSigExpr =
    copy(child = newChild)
}

/** Compiled k-means assignment argmin: squared-euclidean distance from
  * a gridded double vector to each row of a plan-carried centroid
  * matrix, returning struct(d: min distance, c: winning centroid index,
  * ties to the smaller index). Replaces the declarative
  * `array_min(array(struct(aggregate(zip_with(...)), j)))` form, whose
  * per-row cost was k zip_with ARRAY ALLOCATIONS (k=8, dim=64 → eight
  * 64-double allocations per row per iteration); here one bulk copy of
  * the input and a fused multiply-add loop. Arithmetic is bit-identical:
  * per centroid a left fold of (x−y)² in element order, argmin keeping
  * the first minimum. Centroid equality is by CONTENT (deep), not array
  * reference, so canonicalization/dedup work. */
case class KmeansArgminExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression with Serializable {
  require(cents.nonEmpty, "empty centroid matrix")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("d", DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "graft_kmeans_argmin"
  def assign(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val v = a.toDoubleArray()
    var bestD = Double.PositiveInfinity
    var bestC = -1
    var j = 0
    while (j < cents.length) {
      val cv = cents(j)
      if (cv.length != v.length) throw new IllegalArgumentException(
        s"graft_kmeans_argmin: vector dim ${v.length} != centroid dim " +
          s"${cv.length} at centroid $j")
      var acc = 0.0
      var i = 0
      while (i < cv.length) {
        val diff = v(i) - cv(i)
        acc += diff * diff
        i += 1
      }
      if (acc < bestD) { bestD = acc; bestC = j }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }
  protected override def nullSafeEval(a: Any): Any =
    assign(a.asInstanceOf[ArrayData])
  override def equals(other: Any): Boolean = other match {
    case k: KmeansArgminExpr =>
      child == k.child &&
        cents.length == k.cents.length &&
        cents.indices.forall(i =>
          java.util.Arrays.equals(cents(i), k.cents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + cents.map(java.util.Arrays.hashCode).toSeq.hashCode()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argminExpr", this,
      classOf[KmeansArgminExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): KmeansArgminExpr =
    copy(child = newChild)
}

case class TokenGramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_gram_hashes"
  protected override def nullSafeEval(t: Any): Any =
    ArrayKernels.tokenGramHashes(t.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.ArrayKernels.tokenGramHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): TokenGramHashesExpr =
    copy(child = newChild)
}

case class WinnowHashesExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_hashes"
  protected override def nullSafeEval(t: Any): Any =
    ArrayKernels.winnowHashes(t.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.ArrayKernels.winnowHashes($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowHashesExpr =
    copy(child = newChild)
}

case class RollingHashExpr(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"
  protected override def nullSafeEval(t: Any): Any =
    ArrayKernels.rollingHash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.ArrayKernels.rollingHash($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

case class DotFExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.ArrayKernels.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotFExpr =
    copy(left = l, right = r)
}

case class CosineFExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_f"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.ArrayKernels.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineFExpr =
    copy(left = l, right = r)
}

/** JVM-wide deserialized-Bloom-filter cache. The expression instance is
  * serialized into every TASK's codegen references array, so a
  * `transient lazy` field on the expression re-deserializes the bitmap
  * per task — at the advertised 10^8-key (~120 MB) scale that is a
  * per-task allocation storm. Keying the deserialization by a content
  * digest makes it once per EXECUTOR regardless of task count. Bounded
  * as a true LRU: with more than `MaxEntries` live filters only the
  * least-recently-used one is dropped per insert (the round-9 wholesale
  * clear() re-created the per-task allocation storm whenever >16
  * filters — or racing tasks — were in play: hot entries were evicted
  * and re-deserialized on every access). */
private[catalyst] object BloomFilterCache {
  private val MaxEntries = 16
  // access-ordered LinkedHashMap + removeEldestEntry = bounded LRU. The
  // map lock covers ONLY get/put bookkeeping; the ~100ms 120MB
  // deserialize runs OUTSIDE it, memoized per digest through `loading`
  // so concurrent misses on the SAME filter share one load while misses
  // on different filters load in parallel and hits never wait.
  private val cache = new java.util.LinkedHashMap[
      String, org.apache.spark.util.sketch.BloomFilter](32, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, org.apache.spark.util.sketch.BloomFilter])
        : Boolean = size() > MaxEntries
  }
  private val loading = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[
      org.apache.spark.util.sketch.BloomFilter]]()
  def get(digest: String,
          bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter = {
    val hit = cache.synchronized(cache.get(digest))
    if (hit != null) return hit
    val fresh = new java.util.concurrent.CompletableFuture[
      org.apache.spark.util.sketch.BloomFilter]()
    val prior = loading.putIfAbsent(digest, fresh)
    if (prior != null) {
      // get(), not join(): join() is uninterruptible inside Spark task
      // threads (a task kill would be swallowed) and wraps a loader
      // failure in an unchecked CompletionException — rethrow the
      // ORIGINAL cause and surface interrupts as InterruptedException.
      try return prior.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
      }
    }
    try {
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      cache.synchronized(cache.put(digest, bf))
      fresh.complete(bf)
      bf
    } catch {
      case t: Throwable => fresh.completeExceptionally(t); throw t
    } finally loading.remove(digest)
  }
}

/** Codegen membership test against a pre-built Bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter`, the sketch Spark's own
  * runtime row-level filters use). The filter travels as its serialized
  * bytes inside the expression tree and deserializes once per executor
  * via [[BloomFilterCache]] (digest computed once on the driver) — the
  * generated code then calls a plain virtual method per row, keeping
  * the surrounding scan/filter span in whole-stage codegen. This is the
  * broadcast-side primitive for "probe a 10^8-key set without shipping
  * the keys": the bitmap is ~1.2 bytes/key at 1% fpp vs 8+ bytes/key
  * for the exact hash set. Equality is by bitmap CONTENT (an
  * Array[Byte] case field would compare by reference and defeat
  * expression dedup/canonicalization). */
case class BloomContainsExpr(child: Expression, bytes: Array[Byte])
    extends UnaryExpression with Serializable {
  // driver-side digest, serialized with the expression; tasks share the
  // per-executor deserialized filter through it
  private val digest: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    java.util.Base64.getEncoder.encodeToString(md.digest(bytes)) +
      ":" + bytes.length
  }
  @transient private lazy val bloom = BloomFilterCache.get(digest, bytes)
  def test(h: Long): Boolean = bloom.mightContainLong(h)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains"
  override def equals(other: Any): Boolean = other match {
    case b: BloomContainsExpr =>
      child == b.child && java.util.Arrays.equals(bytes, b.bytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bytes)
  protected override def nullSafeEval(h: Any): Any = test(h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomContainsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.test($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}

/** Column-API face of the array kernels. Children are cast explicitly
  * (same technique as [[StatFunctions]]). */
object ArrayFunctions {
  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def e(col: Column): Expression = GraftColumnBridge.expression(col)
  private def longs(col: Column): Expression =
    Cast(e(col), ArrayType(LongType))
  private def floats(col: Column): Expression =
    Cast(e(col), ArrayType(FloatType))

  def jaccardLongs(a: Column, b: Column): Column =
    c(JaccardLongsExpr(longs(a), longs(b)))
  def interLongs(a: Column, b: Column): Column =
    c(InterLongsExpr(longs(a), longs(b)))
  def shingleHashes(text: Column, k: Int): Column =
    c(ShingleHashesExpr(e(text), k))
  def minhashSig(text: Column, k: Int, numHashes: Int): Column =
    c(MinhashSigExpr(e(text), k, numHashes))
  def simhashSig(text: Column, k: Int): Column =
    c(SimhashSigExpr(e(text), k))
  def tokenGramHashes(text: Column, k: Int): Column =
    c(TokenGramHashesExpr(e(text), k))
  def winnowHashes(text: Column, k: Int, w: Int): Column =
    c(WinnowHashesExpr(e(text), k, w))
  def kmeansArgmin(v: Column, cents: Array[Array[Double]]): Column =
    c(KmeansArgminExpr(Cast(e(v), ArrayType(DoubleType)), cents))
  def rollingHash(text: Column): Column = c(RollingHashExpr(e(text)))
  def dotF(a: Column, b: Column): Column = c(DotFExpr(floats(a), floats(b)))
  def cosineF(a: Column, b: Column): Column = c(CosineFExpr(floats(a), floats(b)))
  def bloomContainsLong(h: Column,
                        bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val baos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(baos)
    c(BloomContainsExpr(Cast(e(h), LongType), baos.toByteArray))
  }
}
