package graft

import graft.io.Rda
import org.apache.spark.sql.functions._

/** The .rda reader proven against REAL R-produced bytes — every workspace
  * file shipped inside the reference repo (xz- and bzip2-compressed,
  * factors, dimnamed matrices, S4 objects, generic lists) — plus the
  * write→read round trip that q_io_rda gates against DuckDB. */
class RdaSpec extends SparkSpec {

  private val driverNet = "/root/reference/DriverNet/data"
  private val methylMix = "/root/reference/MethylMix/data"

  test("every reference .rda parses, with the documented object shapes") {
    val expect = Map(
      s"$driverNet/sampleGeneNames.rda" -> ("sampleGeneNames", "factor"),
      s"$driverNet/samplePatientMutationMatrix.rda" ->
        ("samplePatientMutationMatrix", "double"),
      s"$driverNet/samplePatientExpressionMatrix.rda" ->
        ("samplePatientExpressionMatrix", "double"),
      s"$driverNet/samplePatientOutlierMatrix.rda" ->
        ("samplePatientOutlierMatrix", "logical"),
      s"$driverNet/sampleInfluenceGraph.rda" -> ("sampleInfluenceGraph", "double"),
      s"$driverNet/sampleDriversList.rda" -> ("sampleDriversList", "S4"),
      s"$driverNet/sampleRandomDriversResult.rda" ->
        ("sampleRandomDriversResult", "list"),
      s"$methylMix/GEcancer.rda" -> ("GEcancer", "double"),
      s"$methylMix/METcancer.rda" -> ("METcancer", "double"),
      s"$methylMix/METnormal.rda" -> ("METnormal", "double"),
      s"$methylMix/BatchData.rda" -> ("BatchData", "data.frame"),
      s"$methylMix/ProbeAnnotation.rda" -> ("ProbeAnnotation", "data.frame"),
      s"$methylMix/SNPprobes.rda" -> ("SNPprobes", "character"))
    for ((path, (name, rtype)) <- expect) {
      val cat = Rda.objects(spark, path).collect()
      assert(cat.length == 1, s"$path: ${cat.length} objects")
      assert(cat(0).getString(0) == name, s"$path name")
      assert(cat(0).getString(1) == rtype, s"$path: ${cat(0).getString(1)}")
    }
  }

  test("DriverNet mutation matrix: dims, dimnames, binary values") {
    val m = Rda.matrixLong(spark,
      s"$driverNet/samplePatientMutationMatrix.rda",
      "samplePatientMutationMatrix")
    assert(m.count() == 120L * 1255L)
    val vals = m.select("value").distinct().collect().map(_.getDouble(0)).sorted
    assert(vals.sameElements(Array(0.0, 1.0)))
    // dimnames came through as real labels, not index fallbacks
    val aRow = m.select("row_name").first().getString(0)
    assert(aRow.nonEmpty && !aRow.forall(_.isDigit))
  }

  test("DriverNet gene names: factor decodes through its levels") {
    val g = Rda.characterVector(spark,
      s"$driverNet/sampleGeneNames.rda", "sampleGeneNames")
    assert(g.count() == 21494)
    assert(g.where(col("value").isNull).count() == 0)
    // spot labels from the reference package's own documentation domain
    val first = g.orderBy("idx").limit(3).collect().map(_.getString(1))
    assert(first.forall(_.matches("[A-Za-z0-9.-]+")))
  }

  test("MethylMix cohort matrices align on genes x samples") {
    val ge = Rda.matrixLong(spark, s"$methylMix/GEcancer.rda", "GEcancer")
    val met = Rda.matrixLong(spark, s"$methylMix/METcancer.rda", "METcancer")
    // the reference joins these two on (gene, sample): same shape
    assert(ge.count() == met.count())
    val joined = ge.select(col("row_name"), col("col_name"))
      .intersect(met.select(col("row_name"), col("col_name")))
    assert(joined.count() == ge.count())
  }

  test("MethylMix ProbeAnnotation data.frame lifts with typed columns") {
    val df = Rda.dataFrame(spark, s"$methylMix/ProbeAnnotation.rda",
      "ProbeAnnotation")
    assert(df.count() > 100000)
    assert(df.columns.length >= 2)
  }

  test("write -> read round trip preserves values, types, and NAs") {
    import spark.implicits._
    val in = Seq(
      (1, 2.5, "alpha", true),
      (2, -0.0, "béta 中文", false), // latin1+CJK through UTF-8
      (3, Double.MaxValue, null.asInstanceOf[String], true))
      .toDF("i", "d", "s", "b")
      // a null in every type
      .unionByName(Seq((4, 1.0, "x", true)).toDF("i", "d", "s", "b")
        .select(col("i"), lit(null).cast("double").as("d"),
          col("s"), lit(null).cast("boolean").as("b")))
    val path = java.nio.file.Files.createTempDirectory("rda_rt")
      .resolve("t.rda").toString
    Rda.writeDataFrame(in, path, "t")
    val back = Rda.dataFrame(spark, path, "t")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      in.schema.map(f => (f.name, f.dataType)))
    val a = in.orderBy("i").collect().map(_.toSeq)
    val b = back.orderBy("i").collect().map(_.toSeq)
    assert(a.sameElements(b) || a.zip(b).forall { case (x, y) => x == y })
  }

  test("seeded fuzz: 20 random frames round trip exactly " +
      "(NaN collapses to null by the R NA contract)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(421)
    val dir = java.nio.file.Files.createTempDirectory("rda_fuzz")
    for (trial <- 0 until 20) {
      val nCols = 1 + rnd.nextInt(5)
      val nRows = rnd.nextInt(40)
      val types: Seq[DataType] = Seq.fill(nCols)(rnd.nextInt(4) match {
        case 0 => IntegerType
        case 1 => DoubleType
        case 2 => StringType
        case 3 => BooleanType
      })
      def cell(t: DataType): Any =
        if (rnd.nextInt(5) == 0) null
        else t match {
          case IntegerType =>
            // Int.MinValue is R's NA_integer_ sentinel, which
            // writeDataFrame rejects by design — keep it out of the pool
            val v = rnd.nextInt()
            if (v == Int.MinValue) v + 1 else v
          case DoubleType => rnd.nextInt(6) match {
            case 0 => -0.0
            case 1 => Double.PositiveInfinity
            case 2 => Double.MinPositiveValue
            case 3 => Double.NaN // reads back as null (R NA contract)
            case _ => rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10)
          }
          case StringType => rnd.nextInt(4) match {
            case 0 => ""
            case 1 => "naïve × 測試 " + rnd.nextInt(100)
            case 2 => new String(Character.toChars(0x1F600 + rnd.nextInt(16)))
            case _ => rnd.alphanumeric.take(rnd.nextInt(30)).mkString
          }
          case _ => rnd.nextBoolean()
        }
      val schema = StructType(types.zipWithIndex.map { case (t, j) =>
        StructField(s"c$j", t, nullable = true) })
      val rows = Seq.tabulate(nRows)(_ =>
        Row.fromSeq(types.map(cell)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      val path = dir.resolve(s"f$trial.rda").toString
      Rda.writeDataFrame(df, path, s"f$trial")
      val back = Rda.dataFrame(spark, path, s"f$trial").collect()
      assert(back.length == nRows, s"trial $trial row count")
      val expect = rows.map(_.toSeq.map {
        case d: Double if d.isNaN => null // NA contract
        case v => v
      })
      val got = back.map(_.toSeq)
      expect.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
        assert(e == g, s"trial $trial row $i: $e != $g")
      }
    }
  }

  test("truncated or length-corrupted .rda fails with a clean parse error, " +
      "not an OOM allocation or raw index exception") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("rda_corrupt")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1, "a"),
        org.apache.spark.sql.Row(2, "b")), 1),
      StructType(Seq(StructField("i", IntegerType), StructField("s", StringType))))
    val path = dir.resolve("good.rda").toString
    Rda.writeDataFrame(df, path, "g")
    // decompress to raw XDR so byte surgery lands on the stream itself
    val raw = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
      try in.readAllBytes() finally in.close()
    }
    def writeRaw(name: String, bytes: Array[Byte]): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, bytes)
      p.toString
    }
    // sanity: the uncompressed stream itself parses
    assert(Rda.readAll(writeRaw("raw.rda", raw)).nonEmpty)
    // truncation at several depths: always a descriptive parse error
    for (keep <- Seq(raw.length / 4, raw.length / 2, raw.length - 3)) {
      val e = intercept[IllegalArgumentException] {
        Rda.readAll(writeRaw(s"trunc$keep.rda", raw.take(keep)))
      }
      assert(e.getMessage.contains("rda:"), s"keep=$keep: ${e.getMessage}")
    }
    // corrupt a plausible vector length field to a huge value at every
    // 4-byte offset: must never allocate blindly or throw a bare AIOOBE
    for (off <- 20 until (raw.length - 4) by 4) {
      val bad = raw.clone()
      bad(off) = 0x7F.toByte; bad(off + 1) = 0xFF.toByte
      bad(off + 2) = 0xFF.toByte; bad(off + 3) = 0xF0.toByte
      try Rda.readAll(writeRaw(s"huge$off.rda", bad))
      catch {
        case _: IllegalArgumentException => () // clean, descriptive
        case other: Throwable =>
          fail(s"offset $off: expected a clean parse error, got " +
            s"${other.getClass.getSimpleName}: ${other.getMessage}")
      }
    }
  }
}
