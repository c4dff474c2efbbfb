package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The documented 100 TB IVF composition, exercised end to end
  * (round-15): `Similarity.ivfExactTopK`'s scaladoc prescribes a
  * bounded-slice quantizer fit + a persisted centroid matrix +
  * partition-by-`__cell` storage so a probe touches nProbe/nCells of
  * the DATA, not just of the compute. This harness actually does all
  * four steps on an Nx-scaled embeddings corpus and reports the parquet
  * FILE-PRUNING evidence — the probe scan's post-pruning
  * `selectedPartitions` file listing against the full lake — plus
  * probe-vs-full-scan wall time. Results land in
  * SCALING.md next to the 10x tables.
  *
  * Steps (each one the production move, not a test shortcut):
  *   1. fit: `Clustering.kmeansFit` on a bounded DETERMINISTIC slice
  *      (`vec_id % sliceMod = 0` — a predicate that replays in SQL),
  *      never the full corpus;
  *   2. persist: the centroid matrix written as a (cell, centroid)
  *      parquet artifact next to the lake, then re-READ for routing —
  *      the probe never re-fits;
  *   3. write: `Similarity.ivfAssignCells` output written
  *      `.partitionBy("__cell")`;
  *   4. probe: `Similarity.ivfProbeCells` routes the queries, the
  *      probed cell ids (a bounded nQueries×nProbe set) prune the scan
  *      via a partition-column filter, and only routed candidates are
  *      exactly re-scored.
  *
  * Usage: runMain graft.IvfLakeCheck [--copies N] [--cells K]
  *        [--probe P] [--queries Q] [--out dir]
  * Defaults: 10 copies of sf0.1 embeddings (20k rows), 64 cells,
  * probe 4, 5 queries.
  */
object IvfLakeCheck {
  def main(args: Array[String]): Unit = {
    var copies = 10
    var cells = 64
    var probe = 4
    var nQueries = 5
    var out = "/tmp/graft_ivflake"
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--copies" => copies = args(i + 1).toInt; i += 2
        case "--cells" => cells = args(i + 1).toInt; i += 2
        case "--probe" => probe = args(i + 1).toInt; i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
        case "--out" => out = args(i + 1); i += 2
        case _ => i += 1
      }
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE off so the executed plan exposes FileSourceScanExec directly
      // (the scan's pruned file listing IS the evidence this probe reports)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val off = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val corpus = (0 until copies).map { c =>
      emb.withColumn("vec_id", col("vec_id") + lit(c.toLong * off))
    }.reduce(_.union(_))
    val n = corpus.count()

    // 1) bounded deterministic slice fit: ~n/sliceMod rows, predicate
    // replayable in SQL. sliceMod sized so the slice stays ~2k rows
    // whatever --copies is.
    val sliceMod = math.max(1L, n / 2000L)
    val slice = corpus.where(col("vec_id") % lit(sliceMod) === 0)
    val tFit0 = System.nanoTime()
    val centroids = graft.sim.Clustering.kmeansFit(
      slice, "vec_id", "embedding", cells, iters = 2, seed = 42L)
    val fitSec = (System.nanoTime() - tFit0) / 1e9
    println(f"[ivflake] fit: $cells cells on a ${slice.count()}-row " +
      f"deterministic slice (vec_id %% $sliceMod = 0) of $n rows " +
      f"in $fitSec%.1f s")

    // Sizing estimate, BEFORE committing to a lake layout: assign the
    // same bounded slice to the fitted centroids and count the
    // non-empty cells. When the requested fanout exceeds the corpus's
    // intrinsic cluster count the fit emits duplicate centroids and
    // assignment ties break to the lowest id, so the effective
    // partition count saturates — the slice (already in hand from the
    // fit, driver-bounded) predicts that saturation without touching
    // the full corpus. A production deploy reads this number and
    // re-fits with nCells ~ effective before writing 100 TB.
    val effectiveCells = graft.sim.Similarity
      .ivfAssignCells(slice, "vec_id", "embedding", centroids)
      .select("__cell").distinct().count()
    println(s"[ivflake] sizing: $effectiveCells of $cells cells " +
      "non-empty on the fit slice (effective fanout estimate; " +
      "re-fit with nCells near this before committing a layout)")

    // 2) persist the centroid matrix; routing below RE-READS it (the
    // probe never re-fits)
    val centPath = s"$out/centroids.parquet"
    centroids.zipWithIndex.map { case (cv, c) => (c, cv.toSeq) }
      .toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(centPath)
    val loaded = spark.read.parquet(centPath)
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    require(loaded.length == cells, s"persisted ${loaded.length} != $cells")

    // 3) the lake: assignment written partitioned by cell. The
    // repartition on the partition column is the small-files discipline:
    // without it every write task emits one file into every cell
    // directory it holds rows for (32 tasks × 64 cells ≈ 630 files for
    // 20k rows — measured); clustered, each cell gets its task's single
    // file. At 100 TB the same move bounds files at
    // nCells × ceil(cell_bytes / target_file_bytes).
    val lakePath = s"$out/lake.parquet"
    val tW0 = System.nanoTime()
    graft.sim.Similarity
      .ivfAssignCells(corpus, "vec_id", "embedding", loaded)
      .repartition(cells, col("__cell"))
      .write.mode("overwrite").partitionBy("__cell").parquet(lakePath)
    val writeSec = (System.nanoTime() - tW0) / 1e9
    def parquetFiles(dir: java.io.File): Int = {
      val kids = Option(dir.listFiles()).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
        kids.filter(_.isDirectory).map(parquetFiles).sum
    }
    val totalFiles = parquetFiles(new java.io.File(lakePath))
    println(f"[ivflake] lake: $n rows -> $cells cell partitions, " +
      f"$totalFiles parquet files, written in $writeSec%.1f s")

    // 4) probe: route queries against the PERSISTED centroids, prune the
    // scan to the probed partitions, rescore candidates only
    val queries = emb.where(col("vec_id") < nQueries)
    val probes = graft.sim.Similarity
      .ivfProbeCells(queries, "vec_id", "embedding", loaded, probe)
      .localCheckpoint(true)
    val probedCells = probes.select("__cell").distinct()
      .as[Int].collect().sorted
    println(s"[ivflake] probe: $nQueries queries x $probe cells -> " +
      s"${probedCells.length} distinct partitions ${probedCells.mkString("[", ",", "]")}")

    // pruning evidence from the scan's POST-PRUNING file listing
    // (selectedPartitions — the definitive set of files the scan reads,
    // computed on the driver after partition-filter pruning). The
    // numFiles SQLMetric is NOT reliable here: under the sort-merge
    // join shape the 100x probe plans, the accumulator on the
    // executedPlan's scan instance stays zero even though the scan ran
    // and selectedPartitions shows the pruned listing.
    def scanFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    def topk(cand: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id"))
      cand.join(probes.select("query_id", "__qv").distinct(),
          Seq("query_id"))
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cos",
          graft.sim.Similarity.cosine(col("__qv"), col("__cv")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank")
    }
    val lake = spark.read.parquet(lakePath)

    // probe read: partition-column filter on the routed cells — static
    // pruning, the exact read a production router issues
    val probeCand = lake
      .where(col("__cell").isin(probedCells.map(Int.box): _*))
      .join(probes.select("query_id", "__cell"), Seq("__cell"))
    val probeOut = topk(probeCand)
    // full-scan baseline over the SAME lake (what the probe saves)
    val fullCand = lake.crossJoin(probes.select("query_id").distinct())
    val fullOut = topk(fullCand)
    // one untimed warm pass each (codegen + page cache), then timed
    // min-of-2 interleaved — at this SF the wall is fixed-cost-bound and
    // run order would otherwise decide the comparison; the FILE metrics
    // below are the scale evidence, the walls just sanity-check it
    val probeRows = probeOut.collect().length
    val fullRows = fullOut.collect().length
    def timeMin2(df: org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    val fullSec = timeMin2(fullOut)
    val probeSec = timeMin2(probeOut)
    val probeFiles = scanFiles(probeOut)
    val fullFiles = scanFiles(fullOut)

    println(f"[ivflake] probe scan: $probeFiles files of $totalFiles " +
      f"(${100.0 * probeFiles / math.max(1, totalFiles)}%.1f%%; routed " +
      f"${probedCells.length}/$cells cells), $probeRows result rows, " +
      f"$probeSec%.2f s")
    println(f"[ivflake] full scan:  $fullFiles files, $fullRows result " +
      f"rows, $fullSec%.2f s")
    println(f"[ivflake] summary: files pruned to " +
      f"${100.0 * probeFiles / math.max(1, totalFiles)}%.1f%% " +
      f"(cells ${probedCells.length}/$cells = " +
      f"${100.0 * probedCells.length / cells}%.1f%%), " +
      f"probe/full wall = ${probeSec / fullSec}%.2f")
    spark.stop()
  }
}
