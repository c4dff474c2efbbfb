package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The committed skew probe behind [[graft.streaming.Events.ingestDecisions]]'s
  * scaladoc contract (round-13): with one source holding ~90% of rows,
  * the BATCH face's per-source `row_number` window funnels 0.9·corpus
  * through a single partition sort — fine as the oracle-definition
  * face, a hazard at 100 TB — while [[graft.streaming.Events.streamingIngest]]
  * bounds the same window to one micro-batch and carries per-source
  * history as a broadcast prior-count ledger, so its per-trigger cost
  * stays batch-sized as the corpus grows.
  *
  * Measures, on a 90%-skewed synthetic corpus built from sf0.1
  * documents (uniquified text so unique-survivor count — the window
  * input — is corpus-sized):
  *   - batch face wall seconds at 1x and Nx corpus (expect ~linear
  *     growth with the skewed sort riding the dominant source);
  *   - streaming face per-trigger `triggerExecution` at fixed
  *     batch size = the 1x corpus, N triggers over the Nx corpus
  *     (expect near-flat across triggers — the only growth term is the
  *     accumulated content-hash store probe, a distributed join, not a
  *     single-partition sort).
  *
  * Usage: runMain graft.IngestSkewCheck [--copies N]   (default 10;
  * base corpus = 20 uniquified copies of sf0.1 documents ≈ 100k rows).
  * Results land in SCALING.md's skew table.
  */
object IngestSkewCheck {
  def main(args: Array[String]): Unit = {
    var copies = 10
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--copies" => copies = args(i + 1).toInt; i += 2
        case _ => i += 1
      }
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text", "source")
    val baseN = docs.count()

    // uniquified blocks of the base table: doc_id offset per block, text
    // suffixed with the global id (so every row is a UNIQUE survivor and
    // the quota window sees the whole corpus), source forced to a 90/10
    // split with S0 dominant. One explode, not an N-way union — the plan
    // stays constant-size at any multiplier.
    def corpus(loBlock: Int, hiBlock: Int): DataFrame = docs
      .withColumn("__b",
        explode(sequence(lit(loBlock), lit(hiBlock - 1))))
      .withColumn("doc_id",
        col("doc_id") + col("__b").cast("long") * lit(baseN + 7))
      .drop("__b")
      // the base table is ONE parquet file: without this shuffle the
      // explode and every narrow stage after it (the text kernels!)
      // would run in a single task and the probe would measure its own
      // fixture, not the ingest
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("text", concat(col("text"), lit(" uniq"), col("doc_id")))
      .withColumn("source",
        when(col("doc_id") % 10 =!= 0, lit("S0")).otherwise(col("source")))

    val baseBlocks = 20 // 1x corpus ≈ 100k rows

    // eval set: a sliver of base text (some contamination on block 0)
    val eval = docs.limit(50).select(col("doc_id"), col("text"))
      .localCheckpoint(true)

    val oneX = corpus(0, baseBlocks).localCheckpoint(true)
    val bigX = corpus(0, baseBlocks * copies).localCheckpoint(true)
    println(s"[skew] corpus 1x=${oneX.count()} rows, " +
      s"${copies}x=${bigX.count()} rows, dominant-source share ~0.9")

    def timeBatch(df: DataFrame, label: String): Double = {
      val t0 = System.nanoTime()
      val n = graft.streaming.Events.ingestDecisions(
        df, eval, "doc_id", "text", "source", quota = 1000L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[skew] batch-face $label%-5s ${sec}%7.2f s  rows=$n " +
        f"(${sec * 1e6 / math.max(1, n)}%5.1f us/row)")
      sec
    }
    // JIT warm on the small corpus, then timed 1x / Nx / NNx — the third
    // decade (default 10M rows, ~9M of them through ONE admit-window
    // sort task) is where the batch face's skew term surfaces: per-row
    // cost falls 1x -> Nx (fixed costs amortize) then RISES at NNx as
    // the dominant source's single-partition sort stops scaling
    timeBatch(oneX, "warm")
    val b1 = timeBatch(oneX, "1x")
    val bN = timeBatch(bigX, s"${copies}x")
    // the NNx corpus (~10M rows of text) is deliberately NOT
    // localCheckpoint'ed like 1x/Nx — materializing it would dominate the
    // heap — so its timing would otherwise include fixture generation
    // (explode + full-corpus repartition + text concat) the smaller
    // decades exclude. Measure the fixture-only cost and subtract it so
    // all three decades measure only the ingest. The baseline must
    // materialize EVERY column: under a count() Catalyst prunes the
    // text-concat/source projections straight through the Repartition
    // (round-14 this baseline was a count and underestimated the fixture
    // ~10x — the NNx row was still fixture-contaminated). A noop-sink
    // write runs the identical generation plan with no pruning and no
    // output cost.
    val bigger = corpus(0, baseBlocks * copies * copies)
    val tf0 = System.nanoTime()
    bigger.write.format("noop").mode("overwrite").save()
    val fixtureSec = (System.nanoTime() - tf0) / 1e9
    println(f"[skew] ${copies * copies}x fixture-only baseline " +
      f"$fixtureSec%7.2f s (subtracted from the NNx row)")
    val bNNraw = timeBatch(bigger, s"${copies * copies}x")
    val bNN = math.max(0.0, bNNraw - fixtureSec)
    println(f"[skew] batch-face ${copies * copies}x ingest-only " +
      f"$bNN%7.2f s (raw $bNNraw%.2f - fixture $fixtureSec%.2f)")

    // streaming face: the SAME Nx corpus as N files of 1x size, one
    // trigger per file (id-ordered via mtime), per-trigger durations
    // from the progress log
    val staging = java.nio.file.Files.createTempDirectory("graft_skew_stg")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_skew_src")
    (0 until copies).foreach { b =>
      val part = corpus(b * baseBlocks, (b + 1) * baseBlocks)
      part.coalesce(1).write.mode("overwrite").parquet(s"$staging/b$b")
      val f = new java.io.File(s"$staging/b$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = srcDir.resolve(f"b$b%03d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + b * 60000L)
    }
    def dir(n: String) =
      java.nio.file.Files.createTempDirectory(s"graft_skew_$n").toString
    val schema = spark.read.parquet(s"$staging/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val q = graft.streaming.Events.streamingIngest(stream, eval,
      "doc_id", "text", "source", dir("dec"), dir("hsh"), dir("adm"),
      dir("ck"), quota = 1000L)
    q.awaitTermination(1800000)
    val trig = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => p.durationMs.getOrDefault("triggerExecution",
        java.lang.Long.valueOf(-1L)).toDouble / 1000.0)
    trig.zipWithIndex.foreach { case (s, b) =>
      println(f"[skew] stream trigger $b%2d ${s}%7.2f s (batch size = 1x)")
    }
    if (trig.nonEmpty) {
      val growth = trig.last / trig.head
      println(f"[skew] summary: batch-face ${copies}x/1x = ${bN / b1}%.1f, " +
        f"${copies * copies}x/${copies}x = ${bNN / bN}%.1f, " +
        f"stream last/first trigger = $growth%.2f " +
        f"(max ${trig.max}%.2f s vs batch-face ${copies}x ${bN}%.2f s)")
    }
    spark.stop()
  }
}
