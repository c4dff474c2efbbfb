package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native reader/writer for R workspace files (.rda / .RData, the RDX2
  * XDR serialization) — the reference's packaged-fixture format
  * (`load(...)` in Download_Preprocess.R:686-702, the rda files under
  * DriverNet/data and MethylMix/data). Closes SURVEY §2.1's last ingestion row
  * without an out-of-band conversion step.
  *
  * The format is public knowledge (R Internals §"Serialization Formats"):
  * a magic line `RDX2\n`, an `X\n` (XDR big-endian) format marker, three
  * version ints, then a tagged pairlist of (symbol → value) — the saved
  * objects. Values are SEXPs: a 4-byte flags word (type, levels,
  * object/attribute/tag bits) followed by the type-specific payload.
  * Compression is sniffed from the leading bytes: gzip (JDK), xz / bzip2
  * (commons-compress, already on the Spark classpath).
  *
  * Supported SEXP types: NULL, symbols, pairlists, CHARSXP (UTF-8 and
  * latin1), STRSXP, REALSXP, INTSXP, LGLSXP, CPLXSXP, RAWSXP, VECSXP,
  * S4SXP, ENVSXP (opaque), the reference table, and the ALTREP forms R
  * ≥ 3.5 emits for compact sequences (`compact_intseq`,
  * `compact_realseq`) and wrapped vectors (`wrap_*`) — data-frame
  * row.names serialize as exactly such a compact sequence. Verified in
  * RdaSpec against every .rda shipped inside the reference repo
  * (13 files: factors, dimnamed matrices, S4 objects, generic lists —
  * all parse to the last byte).
  *
  * Scale contract: .rda is an in-memory R format — the reference itself
  * materializes these objects whole — so the parse is DRIVER-side by
  * design, for package-fixture-sized inputs. The Spark adapters
  * ([[Rda.matrixLong]], [[Rda.dataFrame]], [[Rda.characterVector]])
  * immediately lift the parsed object into a distributed Dataset; a
  * 100 TB deployment converts once at ingest and lands parquet, exactly
  * like the CSV/TSV paths. */
object Rda {

  // ---------------------------------------------------------------- model

  /** Minimal R object model — exactly what the supported SEXPs carry. */
  sealed trait RObj
  case object RNull extends RObj
  final case class RSym(name: String) extends RObj
  /** NULL entries (R NA_character_) are null elements. */
  final case class RStr(values: Array[String], attrs: Map[String, RObj])
      extends RObj
  /** R NA_real_ arrives as a NaN (payload-preserving). */
  final case class RReal(values: Array[Double], attrs: Map[String, RObj])
      extends RObj
  /** R NA_integer_ is Int.MinValue (R's own sentinel). */
  final case class RInt(values: Array[Int], attrs: Map[String, RObj])
      extends RObj
  /** Logical vector; Int.MinValue = NA, else 0/1. */
  final case class RLgl(values: Array[Int], attrs: Map[String, RObj])
      extends RObj
  final case class RRaw(values: Array[Byte], attrs: Map[String, RObj])
      extends RObj
  final case class RList(values: IndexedSeq[RObj], attrs: Map[String, RObj])
      extends RObj
  final case class RPair(tag: Option[String], car: RObj, cdr: RObj,
                         attrs: Map[String, RObj]) extends RObj
  final case class RS4(attrs: Map[String, RObj]) extends RObj
  /** Environments and other opaque types parse positionally but carry no
    * data out. */
  case object ROpaque extends RObj

  /** R's NA_integer_ sentinel. */
  val NaInt: Int = Int.MinValue
  /** R's NA_real_ bit pattern (0x7FF00000000007A2). */
  val NaRealBits: Long = 0x7FF00000000007A2L

  // --------------------------------------------------------------- reader

  /** Parse every (name, object) binding saved in an .rda file. */
  def readAll(path: String): Seq[(String, RObj)] = {
    val p = new Parser(decompress(path))
    p.header()
    var out = List.empty[(String, RObj)]
    var node = p.item()
    while (node != RNull) node match {
      case RPair(tag, car, cdr, _) =>
        out = (tag.getOrElse(""), car) :: out
        node = cdr
      case other =>
        throw new IllegalArgumentException(
          s"rda: top level is not a pairlist of bindings: $other")
    }
    out.reverse
  }

  /** Read one named object, failing with the available names otherwise. */
  def readObject(path: String, name: String): RObj = {
    val all = readAll(path)
    all.collectFirst { case (`name`, o) => o }.getOrElse(
      throw new IllegalArgumentException(
        s"rda: no object '$name' in $path (has: ${all.map(_._1).mkString(", ")})"))
  }

  private def decompress(path: String): Array[Byte] = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val in: java.io.InputStream = {
      val bis = new java.io.ByteArrayInputStream(raw)
      if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B)
        new java.util.zip.GZIPInputStream(bis)
      else if (raw.length >= 2 && (raw(0) & 0xFF) == 0xFD && raw(1) == '7')
        new org.apache.commons.compress.compressors.xz.XZCompressorInputStream(bis)
      else if (raw.length >= 3 && raw(0) == 'B' && raw(1) == 'Z' && raw(2) == 'h')
        new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(bis)
      else bis
    }
    try in.readAllBytes() finally in.close()
  }

  private final class Parser(d: Array[Byte]) {
    private var o = 0
    private val refs = scala.collection.mutable.ArrayBuffer.empty[RObj]

    /** Every read and every length field is validated against the bytes
      * actually remaining BEFORE any allocation or index: .rda files are
      * untrusted input, and a crafted/truncated length would otherwise
      * trigger a multi-GB driver allocation or a bare
      * ArrayIndexOutOfBoundsException instead of a clean parse error. */
    private def need(n: Long, what: String): Unit =
      if (n < 0 || o.toLong + n > d.length)
        throw new IllegalArgumentException(
          s"rda: truncated/corrupt stream — need $n bytes for $what at " +
            s"offset $o of ${d.length}")

    private def i4(): Int = {
      need(4, "int")
      val v = ((d(o) & 0xFF) << 24) | ((d(o + 1) & 0xFF) << 16) |
        ((d(o + 2) & 0xFF) << 8) | (d(o + 3) & 0xFF)
      o += 4; v
    }
    private def f8(): Double = {
      need(8, "double")
      var bits = 0L
      var i = 0
      while (i < 8) { bits = (bits << 8) | (d(o + i) & 0xFFL); i += 1 }
      o += 8
      java.lang.Double.longBitsToDouble(bits)
    }
    private def bytes(n: Int): Array[Byte] = {
      need(n, "raw bytes")
      val v = java.util.Arrays.copyOfRange(d, o, o + n); o += n; v
    }
    /** Decode a vector length and validate it against the remaining
      * payload at `minElemBytes` per element (the MINIMUM serialized
      * width of one element — exact for fixed-width SEXPs, a lower bound
      * for STRSXP/VECSXP whose elements are themselves items) before the
      * caller allocates. */
    private def len(minElemBytes: Int): Int = {
      val n0 = i4()
      val n =
        if (n0 != -1) n0
        else { // long-vector encoding: two ints (JVM arrays cap at Int)
          val hi = i4().toLong; val lo = i4().toLong & 0xFFFFFFFFL
          val full = (hi << 32) | lo
          require(full >= 0 && full <= Int.MaxValue,
            s"rda: vector of $full elements")
          full.toInt
        }
      if (n < 0) throw new IllegalArgumentException(
        s"rda: truncated/corrupt stream — negative vector length $n at offset $o")
      need(n.toLong * minElemBytes, s"vector of $n elements")
      n
    }

    def header(): Unit = {
      // optional "RDX2\n" magic (save() files carry it; serialize() not)
      if (d.length >= 5 && d(0) == 'R' && d(1) == 'D' && d(2) == 'X' &&
          d(3) == '2' && d(4) == '\n') o = 5
      val f0 = d(o); val f1 = d(o + 1)
      require(f0 == 'X' && f1 == '\n',
        s"rda: only XDR ('X\\n') format is supported, saw ${f0.toChar}${f1.toChar}")
      o += 2
      val version = i4(); i4(); i4() // version, writer R, min reader R
      require(version == 2 || version == 3,
        s"rda: unsupported serialization version $version")
      if (version == 3) { // v3 adds a native-encoding string to the header
        val n = i4(); need(n, "header encoding string"); o += n
      }
    }

    private def attrsIf(has: Boolean): Map[String, RObj] =
      if (!has) Map.empty
      else pairsToMap(item())

    private def pairsToMap(x: RObj): Map[String, RObj] = {
      var m = Map.empty[String, RObj]
      var node = x
      while (node != RNull) node match {
        case RPair(tag, car, cdr, _) =>
          tag.foreach(t => m += (t -> car)); node = cdr
        case _ => return m
      }
      m
    }

    def item(): RObj = {
      val flags = i4()
      val t = flags & 255
      val levels = flags >> 12
      val hasAttr = ((flags >> 9) & 1) == 1
      val hasTag = ((flags >> 10) & 1) == 1
      t match {
        case 254 => RNull // NILVALUE
        case 255 => // REFSXP
          val idx = { val i = flags >> 8; if (i == 0) i4() else i }
          if (idx < 1 || idx > refs.length) throw new IllegalArgumentException(
            s"rda: truncated/corrupt stream — ref index $idx of ${refs.length} at offset $o")
          refs(idx - 1)
        case 9 => // CHARSXP — returned wrapped as a 1-slot RStr
          val n = i4()
          if (n == -1) RStr(Array(null), Map.empty)
          else {
            val cs = if ((levels & 0x04) != 0) // LATIN1_MASK
              java.nio.charset.StandardCharsets.ISO_8859_1
            else java.nio.charset.StandardCharsets.UTF_8
            RStr(Array(new String(bytes(n), cs)), Map.empty)
          }
        case 1 => // SYMSXP — interned: enters the ref table
          val s = item() match {
            case RStr(v, _) => v(0)
            case other => throw new IllegalArgumentException(
              s"rda: symbol printname is $other")
          }
          val sym = RSym(s); refs += sym; sym
        case 2 | 6 => // LISTSXP / LANGSXP node
          val attrs = attrsIf(hasAttr)
          val tag = if (hasTag) item() match {
            case RSym(s) => Some(s)
            case _ => None
          } else None
          val car = item(); val cdr = item()
          RPair(tag, car, cdr, attrs)
        case 16 => // STRSXP
          val n = len(8)
          val vals = new Array[String](n)
          var i = 0
          while (i < n) {
            vals(i) = item() match {
              case RStr(v, _) => v(0)
              case RNull => null
              case other => throw new IllegalArgumentException(
                s"rda: STRSXP element is $other")
            }
            i += 1
          }
          RStr(vals, attrsIf(hasAttr))
        case 14 => // REALSXP
          val n = len(8); val vals = new Array[Double](n)
          var i = 0; while (i < n) { vals(i) = f8(); i += 1 }
          RReal(vals, attrsIf(hasAttr))
        case 13 => // INTSXP
          val n = len(4); val vals = new Array[Int](n)
          var i = 0; while (i < n) { vals(i) = i4(); i += 1 }
          RInt(vals, attrsIf(hasAttr))
        case 10 => // LGLSXP
          val n = len(4); val vals = new Array[Int](n)
          var i = 0; while (i < n) { vals(i) = i4(); i += 1 }
          RLgl(vals, attrsIf(hasAttr))
        case 15 => // CPLXSXP — parsed positionally, surfaced as re/im pairs
          val n = len(16); val vals = new Array[Double](2 * n)
          var i = 0; while (i < 2 * n) { vals(i) = f8(); i += 1 }
          RReal(vals, attrsIf(hasAttr))
        case 24 => // RAWSXP
          val n = len(1)
          RRaw(bytes(n), attrsIf(hasAttr))
        case 19 | 20 => // VECSXP / EXPRSXP
          val n = len(4)
          val vals = IndexedSeq.fill(n)(item())
          RList(vals, attrsIf(hasAttr))
        case 25 => // S4SXP — slots live in the attribute pairlist
          RS4(attrsIf(true))
        case 4 => // ENVSXP — consume positionally; opaque to callers.
          // R registers the environment in the ref table BEFORE
          // serializing its contents (self-references and any symbols
          // inside must land at later indices), so reserve the slot
          // first — appending after the children would shift every
          // subsequent ref index by one
          refs += ROpaque
          i4() // locked flag
          item(); item(); item(); item() // enclos, frame, hashtab, attrs
          ROpaque
        case 238 => // ALTREP
          val info = item()
          val state = item()
          // R serializes a wrapped object's attributes (dim, dimnames,
          // class, levels…) in the ALTREP attr slot, NOT on the inner
          // vector — they must be re-attached or a wrap_integer factor
          // silently degrades to bare level codes
          val attrs = pairsToMap(item())
          withAttrs(altrep(info, state), attrs)
        case 241 | 242 => ROpaque // BASENAMESPACE / EMPTYENV
        case 253 => ROpaque // GLOBALENV
        case other => throw new IllegalArgumentException(
          s"rda: unsupported SEXP type $other at offset $o")
      }
    }

    /** Materialize the ALTREP classes R's own serializer emits for plain
      * data: compact integer/real sequences (data-frame row.names!) and
      * wrapped vectors. Anything exotic fails loudly. */
    private def altrep(info: RObj, state: RObj): RObj = {
      val className = info match {
        case RPair(_, RSym(s), _, _) => s
        case RSym(s) => s
        case _ => ""
      }
      (className, state) match {
        case ("compact_intseq", RReal(Array(n, start, dir), _)) =>
          RInt(Array.tabulate(n.toInt)(i =>
            (start + dir * i).toInt), Map.empty)
        case ("compact_realseq", RReal(Array(n, start, dir), _)) =>
          RReal(Array.tabulate(n.toInt)(i => start + dir * i), Map.empty)
        case (c, RPair(_, wrapped, _, _)) if c.startsWith("wrap_") =>
          wrapped
        case (c, s) => throw new IllegalArgumentException(
          s"rda: unsupported ALTREP class '$c' with state $s")
      }
    }

    /** Merge ALTREP-slot attributes onto the materialized vector (the
      * vector's own attrs win on key collision — R never emits both). */
    private def withAttrs(o: RObj, extra: Map[String, RObj]): RObj =
      if (extra.isEmpty) o
      else o match {
        case RStr(v, a) => RStr(v, extra ++ a)
        case RReal(v, a) => RReal(v, extra ++ a)
        case RInt(v, a) => RInt(v, extra ++ a)
        case RLgl(v, a) => RLgl(v, extra ++ a)
        case RRaw(v, a) => RRaw(v, extra ++ a)
        case RList(v, a) => RList(v, extra ++ a)
        case other => other
      }
  }

  // ------------------------------------------------------ Spark adapters

  private def attrStrings(attrs: Map[String, RObj], key: String): Array[String] =
    attrs.get(key) match {
      case Some(RStr(v, _)) => v
      case _ => Array.empty
    }

  /** Catalog view of a file: one row per saved object
    * (name, rtype, length, dims). */
  def objects(spark: SparkSession, path: String): DataFrame = {
    val rows = readAll(path).map { case (name, o) =>
      def dims(attrs: Map[String, RObj]) = attrs.get("dim") match {
        case Some(RInt(v, _)) => v.mkString("x")
        case _ => ""
      }
      val (t, n, dd) = o match {
        case RReal(v, a) => ("double", v.length.toLong, dims(a))
        case RInt(v, a) =>
          (if (attrStrings(a, "class").contains("factor")) "factor"
           else "integer", v.length.toLong, dims(a))
        case RLgl(v, a) => ("logical", v.length.toLong, dims(a))
        case RStr(v, a) => ("character", v.length.toLong, dims(a))
        case RList(v, a) =>
          (if (attrStrings(a, "class").contains("data.frame")) "data.frame"
           else "list", v.length.toLong, dims(a))
        case RS4(a) => ("S4", a.size.toLong, attrStrings(a, "class").mkString(","))
        case RRaw(v, a) => ("raw", v.length.toLong, dims(a))
        case _ => ("other", 0L, "")
      }
      Row(name, t, n, dd)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("name", StringType, false),
        StructField("rtype", StringType, false),
        StructField("length", LongType, false),
        StructField("dims", StringType, false))))
  }

  /** A dimnamed numeric/integer/logical matrix in LONG form
    * (row_name, col_name, value) — the omics shape (patients × genes):
    * exactly how the reference consumes the DriverNet matrices. Missing
    * dimnames fall back to 1-based indices. R stores matrices
    * column-major. */
  def matrixLong(spark: SparkSession, path: String, name: String): DataFrame = {
    val obj = readObject(path, name)
    val (vals, attrs): (Int => Double, Map[String, RObj]) = obj match {
      case RReal(v, a) => (v(_), a)
      case RInt(v, a) =>
        ((i: Int) => if (v(i) == NaInt) Double.NaN else v(i).toDouble, a)
      case RLgl(v, a) =>
        ((i: Int) => if (v(i) == NaInt) Double.NaN else v(i).toDouble, a)
      case other => throw new IllegalArgumentException(
        s"rda: '$name' is not a numeric matrix: ${other.getClass.getSimpleName}")
    }
    val Array(nr, nc) = attrs.get("dim") match {
      case Some(RInt(v, _)) if v.length == 2 => v
      case _ => throw new IllegalArgumentException(s"rda: '$name' has no 2-d dim")
    }
    val (rn, cn) = attrs.get("dimnames") match {
      case Some(RList(IndexedSeq(r, c), _)) =>
        (r match { case RStr(v, _) => v; case _ => Array.empty[String] },
         c match { case RStr(v, _) => v; case _ => Array.empty[String] })
      case _ => (Array.empty[String], Array.empty[String])
    }
    def rname(i: Int) = if (rn.nonEmpty) rn(i) else (i + 1).toString
    def cname(j: Int) = if (cn.nonEmpty) cn(j) else (j + 1).toString
    val rows = for (j <- 0 until nc; i <- 0 until nr) yield {
      val v = vals(j * nr + i)
      Row(rname(i), cname(j), if (v.isNaN) null else v: java.lang.Double)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 100000)),
      StructType(Seq(StructField("row_name", StringType, false),
        StructField("col_name", StringType, false),
        StructField("value", DoubleType, true))))
  }

  /** A character vector or factor as (idx, value) — gene-name lists
    * (sampleGeneNames is a factor: integer codes + a levels attribute). */
  def characterVector(spark: SparkSession, path: String,
                      name: String): DataFrame = {
    val strs: Array[String] = readObject(path, name) match {
      case RStr(v, _) => v
      case RInt(codes, a) if attrStrings(a, "class").contains("factor") =>
        val levels = attrStrings(a, "levels")
        codes.map(c => if (c == NaInt) null else levels(c - 1))
      case other => throw new IllegalArgumentException(
        s"rda: '$name' is not character/factor: ${other.getClass.getSimpleName}")
    }
    val rows = strs.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("idx", LongType, false),
        StructField("value", StringType, true))))
  }

  /** An R data.frame as a Spark DataFrame: names attribute → columns,
    * column types mapped int→int / double→double / logical→boolean /
    * character→string / factor→string. */
  def dataFrame(spark: SparkSession, path: String, name: String): DataFrame = {
    val (cols, attrs) = readObject(path, name) match {
      case RList(v, a) => (v, a)
      case other => throw new IllegalArgumentException(
        s"rda: '$name' is not a data.frame: ${other.getClass.getSimpleName}")
    }
    val names = attrStrings(attrs, "names")
    require(names.length == cols.length, s"rda: '$name' names/columns mismatch")
    val n = cols.headOption.map {
      case RReal(v, _) => v.length
      case RInt(v, _) => v.length
      case RLgl(v, _) => v.length
      case RStr(v, _) => v.length
      case _ => 0
    }.getOrElse(0)
    val fields = new Array[StructField](cols.length)
    val getters = new Array[Int => Any](cols.length)
    cols.zipWithIndex.foreach { case (c, j) =>
      c match {
        case RReal(v, _) =>
          fields(j) = StructField(names(j), DoubleType, true)
          getters(j) = i => if (v(i).isNaN) null else v(i)
        case RInt(v, a) if attrStrings(a, "class").contains("factor") =>
          val levels = attrStrings(a, "levels")
          fields(j) = StructField(names(j), StringType, true)
          getters(j) = i => if (v(i) == NaInt) null else levels(v(i) - 1)
        case RInt(v, _) =>
          fields(j) = StructField(names(j), IntegerType, true)
          getters(j) = i => if (v(i) == NaInt) null else v(i)
        case RLgl(v, _) =>
          fields(j) = StructField(names(j), BooleanType, true)
          getters(j) = i => if (v(i) == NaInt) null else v(i) == 1
        case RStr(v, _) =>
          fields(j) = StructField(names(j), StringType, true)
          getters(j) = i => v(i)
        case other => throw new IllegalArgumentException(
          s"rda: column '${names(j)}' has unsupported type $other")
      }
    }
    val rows = (0 until n).map(i => Row.fromSeq(getters.toSeq.map(_(i))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), StructType(fields.toSeq))
  }

  // --------------------------------------------------------------- writer

  /** Write a Spark DataFrame as a gzip'd RDX2 data.frame — the exporting
    * half of the round trip (the reference's save(); column types map
    * int→INTSXP, long/double→REALSXP, string→STRSXP, boolean→LGLSXP;
    * NULLs become the R NA sentinels). A double NaN survives the write
    * bit-for-bit but reads back as null — in R, NA_real_ IS a NaN
    * payload, so NaN and NA collapse on the read side (fuzz-tested in
    * RdaSpec). Driver-side collect by contract: .rda is an in-memory
    * format. */
  def writeDataFrame(df: DataFrame, path: String, objectName: String): Unit = {
    val schema = df.schema
    val rows = df.collect()
    val out = new java.io.ByteArrayOutputStream()
    val w = new Writer(out)
    w.str("RDX2\n"); w.str("X\n")
    w.i4(2); w.i4(0x040102); w.i4(0x030500) // v2, R 4.1.2, min 3.5.0
    // pairlist node: tag = symbol(objectName), car = the data.frame
    w.i4((1 << 10) | 2) // LISTSXP + hasTag
    w.i4(1); w.charsxp(objectName) // SYMSXP
    // VECSXP of columns, hasAttr
    w.i4((1 << 9) | 19); w.i4(schema.length)
    schema.fields.zipWithIndex.foreach { case (f, j) =>
      f.dataType match {
        case IntegerType =>
          w.i4(13); w.i4(rows.length)
          rows.foreach { r =>
            if (r.isNullAt(j)) w.i4(NaInt)
            else {
              val v = r.getInt(j)
              // Int.MinValue IS R's NA_integer_ sentinel — writing it
              // as data would silently read back as null; fail loudly
              // (the documented NaN→NA double collapse has no integer
              // analogue: R itself cannot represent this value)
              require(v != NaInt, s"rda write: column '${f.name}' holds " +
                "Int.MinValue, which is R's NA_integer_ sentinel")
              w.i4(v)
            }
          }
        case LongType | DoubleType =>
          w.i4(14); w.i4(rows.length)
          rows.foreach { r =>
            if (r.isNullAt(j)) w.i8bits(NaRealBits)
            else w.f8(f.dataType match {
              case LongType =>
                val l = r.getLong(j)
                // R has no int64: longs ride REALSXP, exact only inside
                // the 2^53 double mantissa — beyond that an id would
                // silently corrupt, so fail loudly like the NA sentinel
                require(l.toDouble.toLong == l, s"rda write: column " +
                  s"'${f.name}' holds $l, beyond the exact double range " +
                  "(R has no 64-bit integer type)")
                l.toDouble
              case _ => r.getDouble(j)
            })
          }
        case BooleanType =>
          w.i4(10); w.i4(rows.length)
          rows.foreach(r => w.i4(
            if (r.isNullAt(j)) NaInt else if (r.getBoolean(j)) 1 else 0))
        case StringType =>
          w.i4(16); w.i4(rows.length)
          rows.foreach(r =>
            w.charsxp(if (r.isNullAt(j)) null else r.getString(j)))
        case other => throw new IllegalArgumentException(
          s"rda write: unsupported column type $other for '${f.name}'")
      }
    }
    // attributes: names, row.names (compact NA,-n form), class
    w.pairTag("names"); w.strsxp(schema.fieldNames)
    w.pairTag("row.names"); w.i4(13); w.i4(2); w.i4(NaInt); w.i4(-rows.length)
    w.pairTag("class"); w.strsxp(Array("data.frame"))
    w.i4(254) // end of attribute pairlist
    w.i4(254) // cdr of the top binding: NILVALUE
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try gz.write(out.toByteArray) finally gz.close()
  }

  private final class Writer(out: java.io.ByteArrayOutputStream) {
    def i4(v: Int): Unit = {
      out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
      out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
    }
    def i8bits(bits: Long): Unit = { i4((bits >>> 32).toInt); i4(bits.toInt) }
    def f8(v: Double): Unit = i8bits(java.lang.Double.doubleToRawLongBits(v))
    def str(s: String): Unit = out.write(s.getBytes("UTF-8"))
    def charsxp(s: String): Unit = {
      // UTF-8 encoding bit in the levels field, as R writes it
      i4((0x08 << 12) | 9)
      if (s == null) i4(-1)
      else { val b = s.getBytes("UTF-8"); i4(b.length); out.write(b) }
    }
    def strsxp(vs: Array[String]): Unit = {
      i4(16); i4(vs.length); vs.foreach(charsxp)
    }
    /** Open a pairlist attribute node with the given tag symbol. Symbols
      * are written un-interned (fresh SYMSXP each time — legal, just
      * less compact than R's ref-table reuse). */
    def pairTag(tag: String): Unit = {
      i4((1 << 10) | 2); i4(1); charsxp(tag)
    }
  }
}
