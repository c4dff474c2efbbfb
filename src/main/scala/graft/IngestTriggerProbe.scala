package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-trigger job breakdown of [[graft.streaming.Events.streamingIngest]]
  * — the JobProbe treatment for the streaming face's per-trigger
  * CONSTANT (round-13 skew probe measured it at 4–7× the equivalent
  * batch slice; this names where that constant lives).
  *
  * Shape: the sf0.1 documents table is staged as TWO equal files and
  * streamed with maxFilesPerTrigger=1, so trigger 0 runs with EMPTY
  * hash/admission history (the cold floor) and trigger 1 re-reads a
  * 1-batch history (the steady-state floor — history reads, broadcast
  * prior counts). A SparkListener records every job; a
  * StreamingQueryListener records each trigger's progress row, and jobs
  * are attributed to the trigger whose [start, end] wall window contains
  * their start. The committed record lives in SCALING.md next to the
  * skew table.
  *
  * Usage: runMain graft.IngestTriggerProbe [sfDir]
  */
object IngestTriggerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val eval = docs.limit(50).select(col("doc_id"), col("text"))
      .localCheckpoint(true)

    // stage the corpus as two equal files, mtime-ordered
    val staging = java.nio.file.Files.createTempDirectory("graft_tp_stg")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_tp_src")
    val n = docs.count()
    (0 until 2).foreach { b =>
      val part =
        if (b == 0) docs.where(col("doc_id") % 2 === 0)
        else docs.where(col("doc_id") % 2 === 1)
      part.coalesce(1).write.mode("overwrite").parquet(s"$staging/b$b")
      val f = new java.io.File(s"$staging/b$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = srcDir.resolve(f"b$b%03d.parquet")
      java.nio.file.Files.copy(f.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + b * 60000L)
    }
    println(s"[triggerprobe] corpus $n rows as 2 files (1 trigger each)")

    final case class Job(id: Int, desc: String, t0: Long,
                         var tEnd: Long = -1L, var stages: Int = 0,
                         var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val jl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(e.jobId, Job(e.jobId, desc, e.time,
          stages = e.stageInfos.size,
          tasks = e.stageInfos.map(_.numTasks).sum))
        order.add(e.jobId)
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.tEnd = e.time
      }
    }
    spark.sparkContext.addSparkListener(jl)

    def dir(nm: String) =
      java.nio.file.Files.createTempDirectory(s"graft_tp_$nm").toString
    val schema = spark.read.parquet(s"$staging/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val wall0 = System.currentTimeMillis()
    val q = graft.streaming.Events.streamingIngest(stream, eval,
      "doc_id", "text", "source", dir("dec"), dir("hsh"), dir("adm"),
      dir("ck"), quota = 1000L)
    q.awaitTermination(1800000)
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => Thread.sleep(300) }
    spark.sparkContext.removeSparkListener(jl)

    val wallEnd = System.currentTimeMillis()
    // trigger windows from the progress log
    val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    val fmt = java.time.format.DateTimeFormatter.ISO_DATE_TIME
    // progress.timestamp is the trigger START in ISO time; end = start +
    // triggerExecution. Window i = [start_i, end_i]. A progress row
    // missing 'triggerExecution' must not collapse its window to
    // [start, start] (that silently drops the trigger's jobs and sends
    // the gaps line negative) — fall back to the next trigger's start,
    // or the probe's own termination wall time for the last one.
    val starts = prog.map(p => java.time.OffsetDateTime
      .parse(p.timestamp, fmt).toInstant.toEpochMilli)
    val ends = prog.zipWithIndex.map { case (p, i) =>
      if (p.durationMs.containsKey("triggerExecution"))
        starts(i) + p.durationMs.get("triggerExecution").toLong
      else {
        println(s"[triggerprobe] WARN trigger $i has no triggerExecution " +
          "duration; window end falls back to the next trigger's start")
        if (i + 1 < prog.size) starts(i + 1) else wallEnd
      }
    }
    prog.zipWithIndex.foreach { case (p, i) =>
      val d = p.durationMs
      println(f"[triggerprobe] trigger $i: rows=${p.numInputRows} " +
        f"triggerExecution=${d.getOrDefault("triggerExecution", -1L)} ms " +
        f"(addBatch=${d.getOrDefault("addBatch", -1L)}, " +
        f"getBatch=${d.getOrDefault("getBatch", -1L)}, " +
        f"latestOffset=${d.getOrDefault("latestOffset", -1L)}, " +
        f"queryPlanning=${d.getOrDefault("queryPlanning", -1L)}, " +
        f"walCommit=${d.getOrDefault("walCommit", -1L)}, " +
        f"commitOffsets=${d.getOrDefault("commitOffsets", -1L)})")
      val inWin = order.toArray(Array.empty[Integer]).toSeq.map(jobs.get(_))
        .filter(j => j.t0 >= starts(i) &&
          j.t0 <= ends(i) && j.t0 >= wall0)
      var covered = 0.0
      inWin.foreach { j =>
        val dur = if (j.tEnd > 0) (j.tEnd - j.t0) / 1000.0 else -1.0
        covered += math.max(dur, 0)
        println(f"[triggerprobe]   job ${j.id}%3d ${dur}%7.3f s " +
          f"stages=${j.stages}%-3d tasks=${j.tasks}%-5d ${j.desc.take(86)}")
      }
      println(f"[triggerprobe]   trigger $i: ${inWin.size} jobs, " +
        f"sum-of-jobs ${covered}%.2f s (gaps = driver/store I/O: " +
        f"${(ends(i) - starts(i)) / 1000.0 - covered}%.2f s)")
    }
    // any job matching no trigger window would silently vanish from the
    // breakdown — surface them so the per-trigger sums are auditable
    val unattributed = order.toArray(Array.empty[Integer]).toSeq
      .map(jobs.get(_))
      .filter(j => j.t0 >= wall0 &&
        !prog.indices.exists(i => j.t0 >= starts(i) && j.t0 <= ends(i)))
    if (unattributed.nonEmpty) {
      println(s"[triggerprobe] WARN ${unattributed.size} jobs matched no " +
        "trigger window (between-trigger driver work or clock skew):")
      unattributed.foreach { j =>
        val dur = if (j.tEnd > 0) (j.tEnd - j.t0) / 1000.0 else -1.0
        println(f"[triggerprobe]   unattributed job ${j.id}%3d ${dur}%7.3f s " +
          f"tasks=${j.tasks}%-5d ${j.desc.take(80)}")
      }
    }
    spark.stop()
  }
}
