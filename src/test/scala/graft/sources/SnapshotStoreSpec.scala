package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotStoreSpec extends SparkSpec {

  private def freshRoot = Files.createTempDirectory("graft-snapstore").toString

  test("write/list/read/latest round-trip snapshots") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    val s1 = Seq((1L, 10L), (2L, 20L)).toDF("k", "ts")
    val s2 = Seq((1L, 10L), (2L, 21L), (3L, 30L)).toDF("k", "ts")
    SnapshotStore.write(s1, root, "t", 1L)
    SnapshotStore.write(s2, root, "t", 2L)
    assert(SnapshotStore.snapshotIds(spark, root, "t") == Seq(1L, 2L))
    assert(SnapshotStore.latestId(spark, root, "t").contains(2L))
    assert(SnapshotStore.read(spark, root, "t", 1L).count() == 2)
    assert(SnapshotStore.readLatest(spark, root, "t").count() == 3)
    // immutability: re-writing an id refuses
    intercept[IllegalArgumentException] {
      SnapshotStore.write(s1, root, "t", 2L)
    }
    // the range-sorted layout round-trips identically and stays immutable
    SnapshotStore.write(s2, root, "t", 3L, sortCols = Seq("k"))
    assert(SnapshotStore.read(spark, root, "t", 3L)
      .collect().map(_.toSeq).toSet == s2.collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException] {
      SnapshotStore.write(s1, root, "t", 3L, sortCols = Seq("k"))
    }
  }

  test("changes between ids classifies I/D/U like the Cdc diff") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    // k=1 unchanged, k=2 updated, k=3 deleted, k=4 inserted,
    // k=5 null->value (null-safe update); payload column beyond (pk, ts)
    // proves the change union stays well-typed for wide tables
    val prev = Seq((1L, Some(10L), "a"), (2L, Some(20L), "b"),
      (3L, Some(30L), "c"), (5L, None: Option[Long], "e")).toDF("k", "ts", "payload")
    val curr = Seq((1L, Some(10L), "a"), (2L, Some(21L), "b2"),
      (4L, Some(40L), "d"), (5L, Some(50L), "e2")).toDF("k", "ts", "payload")
    SnapshotStore.write(prev, root, "t", 10L)
    SnapshotStore.write(curr, root, "t", 11L)
    val rows = SnapshotStore.changes(spark, root, "t", 10L, 11L, Seq("k"))
      .collect()
    val got = rows.map(r => (r.getAs[String]("op"), r.getAs[Long]("k"))).toSet
    assert(got == Set(("I", 4L), ("D", 3L), ("U", 2L), ("U", 5L)))
    // updates carry the full CURRENT row, not just (pk, ts)
    val u2 = rows.find(r => r.getAs[String]("op") == "U" && r.getAs[Long]("k") == 2L).get
    assert(u2.getAs[String]("payload") == "b2")
  }

  test("upsertFeed streams landed snapshots as the I/U change set") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    val prev = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(30L)),
      (5L, None: Option[Long])).toDF("k", "ts")
    val curr = Seq((1L, Some(10L)), (2L, Some(21L)), (4L, Some(40L)),
      (5L, Some(50L))).toDF("k", "ts")
    SnapshotStore.write(prev, root, "t", 1L)
    val feed = SnapshotStore.upsertFeed(spark, root, "t", "k")
    val q = feed.writeStream.format("memory").queryName("snapfeed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // snapshot 2 lands while the stream runs
      SnapshotStore.write(curr, root, "t", 2L)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("snapfeed").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    // first snapshot: every key is an insert; second: null-safe U only
    assert(got == Set(
      ("I", 1L, 1L), ("I", 2L, 1L), ("I", 3L, 1L), ("I", 5L, 1L),
      ("I", 4L, 2L), ("U", 2L, 2L), ("U", 5L, 2L)))
    // matches the batch diff minus deletes (absence needs the batch barrier)
    val batch = SnapshotStore.changes(spark, root, "t", 1L, 2L, Seq("k"))
      .filter(col("op") =!= "D")
      .collect().map(r => (r.getString(2), r.getLong(0))).toSet
    val streamedAtSnap2 = got.collect { case (op, k, 2L) => (op, k) }
    assert(streamedAtSnap2 == batch)
  }

  test("upsertFeed resumes from its checkpoint without replaying old snapshots") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    val ckpt = Files.createTempDirectory("graft-feed-ckpt").toString
    val outDir = Files.createTempDirectory("graft-feed-out").toString
    SnapshotStore.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "ts"), root, "t", 1L)
    // foreachBatch parquet sink (the memory sink can't recover a
    // checkpoint); each batch appends, so output accumulates across runs
    def startQuery() = SnapshotStore.upsertFeed(spark, root, "t", "k")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[SnapshotStore.ChangeOut], _: Long) =>
          if (!batch.isEmpty)
            batch.toDF().write.mode("append").parquet(outDir)
      }
      .start()
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).count() == 2) // both keys inserted
    // snapshot 2 lands while the stream is DOWN; restart must emit only
    // the net-new changes (state + source offsets both from checkpoint)
    SnapshotStore.write(Seq((1L, 10L), (2L, 21L), (3L, 30L)).toDF("k", "ts"),
      root, "t", 2L)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    // k=1 unchanged after restart (no U, no replayed I), k=2 updated,
    // k=3 inserted
    assert(rows == Set(("I", 1L, 1L), ("I", 2L, 1L), ("U", 2L, 2L), ("I", 3L, 2L)))
  }

  test("expire unlists atomically; data survives for in-flight readers until vacuum") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    (1L to 4L).foreach { i =>
      SnapshotStore.write(Seq((i, i)).toDF("k", "ts"), root, "t", i)
    }
    // a reader that resolved snapshot 1 BEFORE the expire
    val inFlight = SnapshotStore.read(spark, root, "t", 1L)
    val dropped = SnapshotStore.expire(spark, root, "t", keepLast = 2)
    assert(dropped == Seq(1L, 2L))
    assert(SnapshotStore.snapshotIds(spark, root, "t") == Seq(3L, 4L))
    assert(SnapshotStore.read(spark, root, "t", 3L).count() == 1)
    // deferred GC: the expired dirs are still on disk, the reader finishes
    assert(inFlight.count() == 1)
    // vacuum(includeLandings) collects the expired landings
    val vacuumed = SnapshotStore.vacuum(spark, root, "t", includeLandings = true)
    assert(vacuumed.toSet == Set("snap=1", "snap=2"), vacuumed)
    assert(!new java.io.File(s"$root/t/snap=1").exists())
  }

  test("vacuum collects crash-orphaned landing dirs (only with includeLandings)") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    SnapshotStore.write(Seq((1L, 1L)).toDF("k", "ts"), root, "t", 1L)
    // simulate write(.., 9) crashing between data job and manifest commit
    Seq((9L, 9L)).toDF("k", "ts").write.parquet(s"$root/t/snap=9")
    assert(SnapshotStore.snapshotIds(spark, root, "t") == Seq(1L))
    assert(SnapshotStore.vacuum(spark, root, "t") == Seq.empty) // default: safe
    val vacuumed = SnapshotStore.vacuum(spark, root, "t", includeLandings = true)
    assert(vacuumed == Seq("snap=9"))
    assert(SnapshotStore.snapshotIds(spark, root, "t") == Seq(1L))
    assert(SnapshotStore.read(spark, root, "t", 1L).count() == 1)
  }

  test("manifest commits are serialized: concurrent writers all survive") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    // 8 writers to distinct ids race their read-modify-commit sections;
    // without the manifest lock, last-writer-wins drops siblings
    val ids = (1L to 8L)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = ids.map { i =>
      new Thread(() =>
        try SnapshotStore.write(Seq((i, i)).toDF("k", "ts"), root, "t", i)
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, errs.toArray.mkString("; "))
    assert(SnapshotStore.snapshotIds(spark, root, "t") == ids.toSeq)
    // immutability still refuses duplicates, and the store stays usable
    // afterwards (no lock left behind by the failed write)
    intercept[IllegalArgumentException] {
      SnapshotStore.write(Seq((9L, 9L)).toDF("k", "ts"), root, "t", 1L)
    }
    SnapshotStore.write(Seq((9L, 9L)).toDF("k", "ts"), root, "t", 9L)
    assert(SnapshotStore.latestId(spark, root, "t").contains(9L))
  }

  test("compact rewrites a fragmented snapshot to fewer files, same rows") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    // 32 partitions of tiny data -> 32 tiny files
    val df = spark.range(0, 10000).select(col("id").as("k"),
      (col("id") * 7).as("ts")).repartition(32)
    SnapshotStore.write(df, root, "t", 1L)
    val before = SnapshotStore.read(spark, root, "t", 1L)
      .collect().map(_.toSeq).toSet
    val nFiles = SnapshotStore.compact(spark, root, "t", 1L,
      targetFileBytes = 512L << 20)
    assert(nFiles < 32)
    val after = SnapshotStore.read(spark, root, "t", 1L)
      .collect().map(_.toSeq).toSet
    assert(after == before)
    // foreign/maintenance dirs never poison the snapshot listing
    new java.io.File(s"$root/t/.compact-staging-9").mkdirs()
    new java.io.File(s"$root/t/snap=not-a-number").mkdirs()
    assert(SnapshotStore.snapshotIds(spark, root, "t") == Seq(1L))
  }

  test("compact is atomic for readers: old generation survives until vacuum") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    val df = spark.range(0, 5000).select(col("id").as("k"),
      (col("id") * 3).as("ts")).repartition(8)
    SnapshotStore.write(df, root, "t", 1L)
    val before = SnapshotStore.read(spark, root, "t", 1L)
      .collect().map(_.toSeq).toSet
    // a reader that resolved the snapshot BEFORE the compaction — its plan
    // is pinned to the old generation dir
    val pinned = SnapshotStore.read(spark, root, "t", 1L)
    SnapshotStore.compact(spark, root, "t", 1L, targetFileBytes = 512L << 20)
    // ...keeps reading the complete old generation
    assert(pinned.collect().map(_.toSeq).toSet == before)
    // a fresh reader resolves the compacted generation, same content
    assert(SnapshotStore.read(spark, root, "t", 1L)
      .collect().map(_.toSeq).toSet == before)
    assert(SnapshotStore.snapshotIds(spark, root, "t") == Seq(1L))
    // default vacuum never touches landing dirs (the feed's namespace)
    assert(SnapshotStore.vacuum(spark, root, "t").isEmpty)
    assert(new java.io.File(s"$root/t/snap=1").exists())
    // a second compaction supersedes generation 1
    SnapshotStore.compact(spark, root, "t", 1L, targetFileBytes = 512L << 20)
    val deleted = SnapshotStore.vacuum(spark, root, "t", includeLandings = true)
    assert(deleted.toSet == Set(".data-1-g1", "snap=1"))
    assert(SnapshotStore.read(spark, root, "t", 1L)
      .collect().map(_.toSeq).toSet == before)
  }

  test("upsertFeed is unaffected by compaction of a landed snapshot") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    SnapshotStore.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "ts"), root, "t", 1L)
    val q = SnapshotStore.upsertFeed(spark, root, "t", "k")
      .writeStream.format("memory").queryName("compactfeed")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // maintenance compacts the already-streamed snapshot mid-run: the
      // compacted generation lives outside snap=*, so the feed's glob and
      // already-tracked files are untouched
      SnapshotStore.compact(spark, root, "t", 1L)
      SnapshotStore.write(Seq((1L, 10L), (2L, 21L), (3L, 30L)).toDF("k", "ts"),
        root, "t", 2L)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("compactfeed").collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3))).toSet
    // exactly the batch change set — no replays, no spurious U from the
    // rewritten files
    assert(got == Set(("I", 1L, 1L), ("I", 2L, 1L), ("U", 2L, 2L), ("I", 3L, 2L)))
  }

  test("changeFeed streams the full I/U/D batch-diff chain, with resume") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    val ckpt = Files.createTempDirectory("graft-cfeed-ckpt").toString
    val outDir = Files.createTempDirectory("graft-cfeed-out").toString
    // k1 stable then updated; k2 deleted at 2, back at 3; k3 updated at 2;
    // k4 deleted at 2 and never returns (timeout path); k5 born at 4
    val snaps = Map(
      1L -> Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)),
      2L -> Seq((1L, 10L), (3L, 31L)),
      3L -> Seq((1L, 10L), (2L, 25L), (3L, 31L)),
      4L -> Seq((1L, 11L), (2L, 25L), (3L, 31L), (5L, 50L)))
    def land(id: Long): Unit =
      SnapshotStore.write(snaps(id).toDF("k", "ts"), root, "t", id)
    def startQuery() = SnapshotStore.changeFeed(spark, root, "t", "k")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[SnapshotStore.ChangeOut], _: Long) =>
          if (!batch.isEmpty)
            batch.toDF().write.mode("append").parquet(outDir)
      }
      .start()
    land(1L)
    val q1 = startQuery()
    try { q1.processAllAvailable(); land(2L); q1.processAllAvailable() }
    finally q1.stop()
    // snapshots 3 and 4 land while the stream is DOWN; the restart must
    // recover state, offsets, and the delete watermark from the checkpoint
    land(3L); land(4L)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    def got() = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(1), r.getLong(0),
        if (r.isNullAt(2)) null else r.getLong(2), r.getLong(3))).toSet
    // the timeout delete (k4) may land in a trailing no-data micro-batch —
    // poll briefly rather than racing processAllAvailable
    val expectedN = 10
    val deadline = System.nanoTime() + 15_000_000_000L
    var snapshot = got()
    while (snapshot.size < expectedN && System.nanoTime() < deadline) {
      val q3 = startQuery()
      try q3.processAllAvailable() finally q3.stop()
      snapshot = got()
    }
    // the batch chain over the same snapshots is the oracle
    val batchChain = (1L until 4L).flatMap { from =>
      SnapshotStore.changes(spark, root, "t", from, from + 1, Seq("k"))
        .collect().map(r => (r.getString(2), r.getLong(0),
          if (r.isNullAt(1)) null else r.getLong(1), from + 1))
    }.toSet
    val initial = snaps(1L).map { case (k, ts) => ("I", k, ts: Any, 1L) }.toSet
    assert(snapshot == initial ++ batchChain)
  }

  test("migrateLegacy adopts an unversioned dataset as snapshot 0") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    val legacy = freshRoot + "/legacy"
    Seq((1L, 1L), (2L, 2L)).toDF("k", "ts").write.parquet(legacy)
    SnapshotStore.migrateLegacy(spark, legacy, root, "t")
    assert(SnapshotStore.snapshotIds(spark, root, "t") == Seq(0L))
    assert(SnapshotStore.read(spark, root, "t", 0L).count() == 2)
    // legacy data untouched
    assert(spark.read.parquet(legacy).count() == 2)
  }

  test("graft-snapshot DSv2: time travel, latest default, compaction-aware") {
    val spark0 = spark
    import spark0.implicits._
    val root = freshRoot
    val s1 = Seq((1L, 10L), (2L, 20L)).toDF("k", "ts")
    val s2 = Seq((1L, 10L), (2L, 21L), (3L, 30L)).toDF("k", "ts")
    SnapshotStore.write(s1, root, "t", 1L)
    SnapshotStore.write(s2, root, "t", 2L)

    def readFmt(opts: (String, String)*) = {
      val r = spark.read.format("graft-snapshot") // short name via service file
        .option("root", root).option("table", "t")
      opts.foldLeft(r) { case (r, (k, v)) => r.option(k, v) }.load()
    }
    // snapshot pinning and latest-default both match SnapshotStore.read
    assert(readFmt("snapshot" -> "1").collect().map(_.toSeq).toSet ==
      SnapshotStore.read(spark, root, "t", 1L).collect().map(_.toSeq).toSet)
    assert(readFmt().collect().map(_.toSeq).toSet ==
      s2.collect().map(_.toSeq).toSet)
    // resolution is manifest-based: after compaction the same option set
    // reads the republished generation
    SnapshotStore.compact(spark, root, "t", 2L, targetFileBytes = 1L << 20)
    assert(readFmt("snapshot" -> "2").collect().map(_.toSeq).toSet ==
      s2.collect().map(_.toSeq).toSet)
    // missing snapshot id fails resolution, not silently-empty
    intercept[IllegalArgumentException] { readFmt("snapshot" -> "9") }

    // the scan is the stock parquet DSv2: filters push, columns prune
    val filtered = readFmt().filter(col("k") === 2L)
      .queryExecution.executedPlan.toString
    assert(filtered.contains("PushedFilters: [IsNotNull(k), EqualTo(k,2)]"),
      filtered)
    val projected = readFmt().select("ts")
      .queryExecution.executedPlan.toString
    assert(projected.contains("ReadSchema: struct<ts:bigint"), projected)
  }
}
