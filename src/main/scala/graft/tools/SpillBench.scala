package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Scale probe with executor-memory pressure: runs the named entries
  * once each at SPARK_GRAFT_SF_DIR and records, per entry, the wall
  * clock plus the shuffle/spill task metrics a cluster operator would
  * read off the Spark UI — memory+disk bytes spilled, shuffle bytes
  * written/read, peak execution memory. The point at sf100 (~14 GB
  * input on a deliberately bounded heap) is to SEE the sort/agg/join
  * operators actually spill and keep running, the behavior a 100 TB
  * run lives on, rather than to infer it from plans.
  *
  * `runMain graft.tools.SpillBench [out.json]` with
  * SPILLQ=name,name,... (ordered — an index-building entry placed
  * first leaves its tables for the index-priced reports, mirroring the
  * three-scale bench discipline).
  */
object SpillBench {

  private class MetricsListener extends SparkListener {
    val memSpilled = new AtomicLong(0)
    val diskSpilled = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    val shuffleRead = new AtomicLong(0)
    val peakExecMem = new AtomicLong(0)
    val tasks = new AtomicLong(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        peakExecMem.getAndAccumulate(m.peakExecutionMemory, Math.max(_, _))
        tasks.incrementAndGet()
      }
    }
    def reset(): Unit = {
      memSpilled.set(0); diskSpilled.set(0); shuffleWrite.set(0)
      shuffleRead.set(0); peakExecMem.set(0); tasks.set(0)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = args.headOption.getOrElse("/tmp/spillbench.json")
    val names = sys.env.getOrElse("SPILLQ",
      "dedup_cluster_index_roundtrip,dedup_threshold_report,dedup_clusters," +
        "dedup_apply,dedup_savings,shingle_index_roundtrip," +
        "shingle_containment_indexed," +
        "curation_stage_counts,curation_pipeline,dedup_clusters_largestar," +
        "dedup_minhash_lsh").split(",").map(_.trim).filter(_.nonEmpty)
    // Shuffle/spill compression codec, default zstd: at sf100 it halves
    // spill bytes vs lz4 (38.5→19.6 GB shuffle on the containment index
    // read) and is the difference between shingle-family entries fitting
    // the local scratch disk or dying — the r8 probe's headline result
    // depended on it, so it is pinned HERE, not passed out-of-band, and
    // every emitted artifact row records it.
    val codec = sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd")
    // Same guard as graft.Bench: the value reaches the JSON artifact.
    require(Set("lz4", "zstd", "snappy", "lzf").contains(codec),
      s"SPARK_GRAFT_CODEC must be one of lz4/zstd/snappy/lzf, got: $codec")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", codec)
      // shuffle files outlive their job until the ContextCleaner's
      // periodic GC (default 30 MIN) collects the driver-side refs — at
      // ~60 GB transient spill per entry that fills local disk long
      // before it fires; tighten it and force a GC between entries
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    def gb(b: Long): Double = math.round(b / 1e7) / 100.0

    val rows = names.map { name =>
      listener.reset()
      val t0 = System.nanoTime()
      val status = try {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        "ok"
      } catch { case e: Exception => s"FAIL ${e.getClass.getSimpleName}" }
      val sec = math.round((System.nanoTime() - t0) / 1e7) / 100.0
      // listener events drain asynchronously; give the bus a beat, and
      // GC so the ContextCleaner frees the finished entry's shuffle files
      Thread.sleep(500)
      System.gc()
      Thread.sleep(1500)
      val r = Map(
        "sec" -> sec, "status" -> status, "codec" -> codec,
        "spill_mem_gb" -> gb(listener.memSpilled.get),
        "spill_disk_gb" -> gb(listener.diskSpilled.get),
        "shuffle_write_gb" -> gb(listener.shuffleWrite.get),
        "shuffle_read_gb" -> gb(listener.shuffleRead.get),
        "peak_exec_mem_gb" -> gb(listener.peakExecMem.get),
        "tasks" -> listener.tasks.get)
      println(s"[spill] $name " +
        r.map { case (k, v) => s"$k=$v" }.mkString(" "))
      name -> r
    }
    def j(v: Any): String = v match {
      case s: String => "\"" + s + "\""
      case x => x.toString
    }
    val json = rows.map { case (n, r) =>
      "\"" + n + "\": {" +
        r.map { case (k, v) => "\"" + k + "\": " + j(v) }.mkString(", ") + "}"
    }.mkString("{\n \"sf_dir\": \"" + sfDir + "\", \"heap\": \"" +
      (Runtime.getRuntime.maxMemory / (1 << 30)) + "g\", \"cpus\": " + cpus +
      ", \"entries\": {\n  ", ",\n  ", "\n }}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[spill] wrote $out")
    spark.stop()
  }
}
