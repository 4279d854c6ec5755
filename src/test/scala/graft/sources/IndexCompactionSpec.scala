package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction is the lifecycle verb that keeps chained maintenance
  * viable forever: after base → v2 → v3, the live version references the
  * original base's directories plus one delta generation per hop, and
  * the refs ledger pins all of them. [[ParquetSink.compactPublishedVersion]]
  * must fold the version into a SELF-OWNED root with identical rows,
  * release every foreign pin (so the intermediate version and the
  * original base become droppable/rebuildable), GC its superseded
  * generations, stay republishable (a further delta chains off the
  * compacted version), and survive a catalog restart via its rewritten
  * manifest. Plus the stale-lock janitor: a crashed publisher's lock is
  * breakable by age, a live one is not.
  */
class IndexCompactionSpec extends SparkSpec {

  private def baseRows = Seq(
    (1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L),
    (4L, "d", 20L), (5L, "e", 20L),
    (6L, "f", 30L), (7L, "g", 30L),
    (8L, "h", 40L))

  private def reclaim(versions: String*): Unit =
    versions.foreach(v => ParquetSink.dropIndexVersion(spark, v))

  private def mkBase(tbl: String): Unit = {
    val s = spark
    import s.implicits._
    ParquetSink.writePartitionedSnapshot(
      baseRows.toDF("id", "payload", "bucket"), tbl, "bucket", Seq("id"))
  }

  private def asSet(tbl: String): Set[(Long, String, Long)] =
    spark.table(tbl).select("id", "payload", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  /** base → v2 (bucket 20 gains id 9) → v3 (bucket 30 drops id 6);
    * returns v3's expected content.
    */
  private def chain(base: String, v2: String, v3: String): Set[(Long, String, Long)] = {
    val s = spark
    import s.implicits._
    reclaim(v3, v2)
    mkBase(base)
    ParquetSink.publishPartitionSwap(spark, base, v2, "bucket", Set("20"),
      Seq((4L, "d", 20L), (5L, "e", 20L), (9L, "i", 20L))
        .toDF("id", "payload", "bucket"))
    ParquetSink.publishPartitionSwap(spark, v2, v3, "bucket", Set("30"),
      Seq((7L, "g", 30L)).toDF("id", "payload", "bucket"))
    baseRows.toSet + ((9L, "i", 20L)) - ((6L, "f", 30L))
  }

  test("compaction folds a chained version into a self-owned root, " +
       "releasing the base and the intermediate version") {
    val want = chain("pcomp_base", "pcomp_v2", "pcomp_v3")
    assert(asSet("pcomp_v3") === want)
    // pre-compaction the version reads foreign files (base + v2 delta)
    val preFiles = spark.table("pcomp_v3").inputFiles.toSeq
    assert(preFiles.exists(_.contains("pcomp_v2_delta_g1")))

    ParquetSink.compactPublishedVersion(spark, "pcomp_v3", "bucket", Seq("id"))

    // identical rows, every file under the version's OWN generation root
    assert(asSet("pcomp_v3") === want)
    val postFiles = spark.table("pcomp_v3").inputFiles.toSeq
    assert(postFiles.nonEmpty &&
      postFiles.forall(_.contains("pcomp_v3_g")),
      s"compacted version must own all its files: $postFiles")

    val fs = ParquetSink.tableLocation(spark, "pcomp_v3")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // superseded generation dirs GC'd
    assert(!fs.exists(ParquetSink.tableLocation(spark, "pcomp_v3_delta_g1")))
    assert(!fs.exists(ParquetSink.tableLocation(spark, "pcomp_v3_g1")))

    // foreign pins released: the intermediate version drops cleanly
    // (pre-compaction this throws — v3's ledger references v2's delta),
    // and then the original base rebuilds under the still-live v3
    ParquetSink.dropIndexVersion(spark, "pcomp_v2")
    mkBase("pcomp_base")
    assert(asSet("pcomp_base") === baseRows.toSet)
    assert(asSet("pcomp_v3") === want, "v3 must survive the base rebuild")
    reclaim("pcomp_v3")
  }

  test("a further delta publish chains off a compacted version") {
    val s = spark
    import s.implicits._
    val want = chain("pcomp_base2", "pcomp_v2b", "pcomp_v3b")
    ParquetSink.compactPublishedVersion(spark, "pcomp_v3b", "bucket", Seq("id"))
    reclaim("pcomp_v4b")
    ParquetSink.publishPartitionSwap(spark, "pcomp_v3b", "pcomp_v4b",
      "bucket", Set("10"),
      Seq((1L, "a", 10L), (2L, "b", 10L), (11L, "k", 10L))
        .toDF("id", "payload", "bucket"))
    assert(asSet("pcomp_v4b") === want + ((11L, "k", 10L)) - ((3L, "c", 10L)))
    reclaim("pcomp_v4b", "pcomp_v3b", "pcomp_v2b")
  }

  test("a compacted version adopts from its manifest after a catalog restart") {
    val want = chain("pcomp_base3", "pcomp_v2c", "pcomp_v3c")
    ParquetSink.compactPublishedVersion(spark, "pcomp_v3c", "bucket", Seq("id"))
    // simulate the fresh JVM: catalog entry gone, files + manifest persist
    spark.sql("DROP TABLE `pcomp_v3c`")
    assert(ParquetSink.adoptPublishedVersion(spark, "pcomp_v3c"))
    assert(asSet("pcomp_v3c") === want)
    val pruned = spark.table("pcomp_v3c").filter(col("bucket") === 20L)
    assert(pruned.inputFiles.forall(_.contains("bucket=20")),
      s"adopted compacted version must prune: ${pruned.inputFiles.toSeq}")
    reclaim("pcomp_v3c", "pcomp_v2c")
  }

  test("re-compaction advances the generation and dropIndexVersion " +
       "reclaims a compacted root (no delta-dir-only generation scan)") {
    val want = chain("pcomp_base6", "pcomp_v2f", "pcomp_v3f")
    ParquetSink.compactPublishedVersion(spark, "pcomp_v3f", "bucket", Seq("id"))
    // a SECOND compaction must take a fresh generation (the compacted
    // generation has no delta dir — a delta-only scan would reuse its
    // number and write into the live root), then GC the first
    ParquetSink.compactPublishedVersion(spark, "pcomp_v3f", "bucket", Seq("id"))
    assert(asSet("pcomp_v3f") === want)
    val fs = ParquetSink.tableLocation(spark, "pcomp_v3f")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(ParquetSink.tableLocation(spark, "pcomp_v3f_g2")),
      "first compacted root must be GC'd by the second compaction")
    assert(fs.exists(ParquetSink.tableLocation(spark, "pcomp_v3f_g3")))
    // and dropping the version reclaims the compacted root too
    ParquetSink.dropIndexVersion(spark, "pcomp_v3f")
    assert(!fs.exists(ParquetSink.tableLocation(spark, "pcomp_v3f_g3")),
      "dropIndexVersion must reclaim a compaction-only generation root")
    reclaim("pcomp_v2f")
  }

  test("compaction handles string partition values with quotes end-to-end") {
    val s = spark
    import s.implicits._
    reclaim("pcomp_v2s")
    ParquetSink.writePartitionedSnapshot(
      Seq((1L, "it's"), (2L, "plain"), (3L, "it's")).toDF("id", "tag"),
      "pcomp_base5", "tag", Seq("id"))
    ParquetSink.publishPartitionSwap(spark, "pcomp_base5", "pcomp_v2s",
      "tag", Set("it's"),
      Seq((1L, "it's"), (4L, "it's")).toDF("id", "tag"))
    ParquetSink.compactPublishedVersion(spark, "pcomp_v2s", "tag", Seq("id"))
    def got(): Set[(Long, String)] = spark.table("pcomp_v2s")
      .select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got() === Set((1L, "it's"), (4L, "it's"), (2L, "plain")))
    // and the rewritten manifest round-trips the quoted value
    spark.sql("DROP TABLE `pcomp_v2s`")
    assert(ParquetSink.adoptPublishedVersion(spark, "pcomp_v2s"))
    assert(got() === Set((1L, "it's"), (4L, "it's"), (2L, "plain")))
    reclaim("pcomp_v2s")
  }

  test("breakStalePublishLock breaks only stale locks") {
    val s = spark
    import s.implicits._
    reclaim("pcomp_v2d")
    mkBase("pcomp_base4")
    // a crashed publisher's leftover lock (created directly, no publish)
    val lock = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "pcomp_v2d__publish.lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lock, false)
    try out.write("pid=0 ts=0".getBytes("UTF-8")) finally out.close()

    def publish(): Unit =
      ParquetSink.publishPartitionSwap(spark, "pcomp_base4", "pcomp_v2d",
        "bucket", Set("20"), Seq((9L, "i", 20L)).toDF("id", "payload", "bucket"))

    intercept[IllegalStateException](publish())
    // a YOUNG lock (presumed live publisher) is not breakable
    assert(!ParquetSink.breakStalePublishLock(spark, "pcomp_v2d",
      maxAgeMs = 24L * 3600 * 1000))
    intercept[IllegalStateException](publish())
    // past the staleness threshold the janitor clears it; absent → false
    assert(ParquetSink.breakStalePublishLock(spark, "pcomp_v2d", maxAgeMs = 0))
    assert(!ParquetSink.breakStalePublishLock(spark, "pcomp_v2d", maxAgeMs = 0))
    publish()
    assert(asSet("pcomp_v2d") ===
      baseRows.toSet -- Set((4L, "d", 20L), (5L, "e", 20L)) + ((9L, "i", 20L)))
    reclaim("pcomp_v2d")
  }
}
