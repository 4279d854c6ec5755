package graft.sources

import graft.SparkSpec

/** `fsckPublishedVersion` is the read-only health probe of the publish
  * machinery: every agreement the commit discipline maintains between
  * catalog, manifest, refs ledger and filesystem is checked and each
  * violation reported as a `(severity, check, detail)` row. These specs
  * prove a clean bill on healthy published AND compacted versions, then
  * break each invariant deliberately — vanished partition dir, emptied
  * ledger (the unpinned crash window), stale manifest (catalog drift),
  * stage debris, a crashed publisher's lock, a fabricated orphan
  * generation — and assert the exact finding appears, and that fsck
  * itself never repairs or deletes anything (read-only by contract).
  */
class PublishFsckSpec extends SparkSpec {

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

  private def publish(base: String, v2: String): Unit = {
    val s = spark
    import s.implicits._
    ParquetSink.publishPartitionSwap(spark, base, v2, "bucket",
      Set("20"), Seq((9L, "i", 20L)).toDF("id", "payload", "bucket"),
      sortCols = Seq("id"))
  }

  private def checks(v2: String, lockMaxAgeMs: Long = 30L * 60 * 1000)
      : Seq[(String, String, String)] =
    ParquetSink.fsckPublishedVersion(spark, v2, lockMaxAgeMs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  private def fs = ParquetSink.tableLocation(spark, "x")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def whPath(name: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)

  test("healthy published version: zero findings, registered or adopted") {
    reclaim("fsck_v2"); mkBase("fsck_base")
    publish("fsck_base", "fsck_v2")
    assert(checks("fsck_v2").isEmpty)
    // fresh-catalog view of the same version (manifest-only) is clean too
    spark.sql("DROP TABLE IF EXISTS `fsck_v2`")
    assert(checks("fsck_v2").isEmpty)
    assert(ParquetSink.adoptPublishedVersion(spark, "fsck_v2"))
    assert(checks("fsck_v2").isEmpty)
  }

  test("healthy compacted version: no ledger is not a finding") {
    reclaim("fsck_cv2"); mkBase("fsck_cbase")
    publish("fsck_cbase", "fsck_cv2")
    ParquetSink.compactPublishedVersion(spark, "fsck_cv2", "bucket", Seq("id"))
    assert(checks("fsck_cv2").isEmpty)
  }

  test("never-published name reports version-unknown") {
    assert(checks("fsck_nosuch").map(_._2) === Seq("version-unknown"))
  }

  test("vanished partition directory is an error") {
    reclaim("fsck_v2m"); mkBase("fsck_basem")
    publish("fsck_basem", "fsck_v2m")
    // delete a base partition dir out-of-band (bypassing the guard)
    val victim = new org.apache.hadoop.fs.Path(
      ParquetSink.tableLocation(spark, "fsck_basem"), "bucket=30")
    assert(fs.delete(victim, true))
    val found = checks("fsck_v2m")
    assert(found.exists(f => f._1 == "error" && f._2 == "partition-missing" &&
      f._3.contains("bucket=30")), s"findings: $found")
  }

  test("emptied ledger reports every foreign reference unpinned") {
    reclaim("fsck_v2u"); mkBase("fsck_baseu")
    publish("fsck_baseu", "fsck_v2u")
    val refs = whPath("fsck_v2u__refs.txt")
    val out = fs.create(refs, true); out.close()
    val found = checks("fsck_v2u")
    // three carried-over base partitions (10, 30, 40-survivor set minus
    // affected 20) lost their pins
    assert(found.count(f => f._1 == "error" && f._2 == "unpinned-reference") === 3,
      s"findings: $found")
    // fsck is read-only: the broken ledger is still broken after
    assert(fs.getFileStatus(refs).getLen === 0)
    // repair rebuilds the pin set from the manifest and fsck goes clean
    assert(ParquetSink.repairVersionLedger(spark, "fsck_v2u"))
    assert(checks("fsck_v2u").isEmpty)
    // and the rebuilt ledger actually guards again: the base rebuild is
    // refused while the repaired version lives
    intercept[IllegalStateException] { mkBase("fsck_baseu") }
  }

  test("repairVersionLedger: compacted form restores ledger absence; no manifest = no-op") {
    reclaim("fsck_rcv2"); mkBase("fsck_rcbase")
    publish("fsck_rcbase", "fsck_rcv2")
    ParquetSink.compactPublishedVersion(spark, "fsck_rcv2", "bucket", Seq("id"))
    // damage: a stray over-pinning ledger appears on the compacted version
    val refs = whPath("fsck_rcv2__refs.txt")
    val out = fs.create(refs, true)
    try out.write(ParquetSink.tableLocation(spark, "fsck_rcbase").toString
      .getBytes("UTF-8")) finally out.close()
    assert(checks("fsck_rcv2").exists(_._2 == "over-pin"))
    assert(ParquetSink.repairVersionLedger(spark, "fsck_rcv2"))
    assert(!fs.exists(refs), "compacted repair must remove the ledger, not empty it")
    assert(checks("fsck_rcv2").isEmpty)
    assert(!ParquetSink.repairVersionLedger(spark, "fsck_norepair"))
  }

  test("stale manifest vs catalog reports catalog-drift") {
    reclaim("fsck_v2d"); mkBase("fsck_based")
    publish("fsck_based", "fsck_v2d")
    // simulate a death between RENAME and manifest write on a REpublish:
    // catalog advances to generation 2 while the manifest still says 1.
    val mf = whPath("fsck_v2d__manifest.txt")
    val in = fs.open(mf)
    val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    publish("fsck_based", "fsck_v2d") // now at generation 2, manifest rewritten
    val out = fs.create(mf, true)
    try out.write(body.getBytes("UTF-8")) finally out.close() // restore gen-1 manifest
    val found = checks("fsck_v2d")
    assert(found.exists(f => f._1 == "error" && f._2 == "catalog-drift"),
      s"findings: $found")
  }

  test("stage debris, manifest tmp and publish lock are reported") {
    reclaim("fsck_v2s"); mkBase("fsck_bases")
    publish("fsck_bases", "fsck_v2s")
    spark.sql("CREATE TABLE `fsck_v2s__stage` (x BIGINT) USING PARQUET " +
      s"LOCATION '${whPath("fsck_v2s__stage_orphan")}'")
    fs.create(whPath("fsck_v2s__manifest.txt.__tmp"), true).close()
    fs.create(whPath("fsck_v2s__publish.lock"), true).close()
    val found = checks("fsck_v2s", lockMaxAgeMs = 0) // everything is stale at 0
    assert(found.exists(f => f._2 == "stage-leftover" && f._3.contains("staging table")))
    assert(found.exists(f => f._2 == "manifest-tmp-leftover"))
    assert(found.exists(f => f._1 == "warn" && f._2 == "publish-lock"))
    // a young lock is informational, not a warning
    val young = checks("fsck_v2s", lockMaxAgeMs = Long.MaxValue)
    assert(young.exists(f => f._1 == "info" && f._2 == "publish-lock"))
    spark.sql("DROP TABLE `fsck_v2s__stage`")
    fs.delete(whPath("fsck_v2s__manifest.txt.__tmp"), false)
    fs.delete(whPath("fsck_v2s__publish.lock"), false)
    assert(checks("fsck_v2s").isEmpty)
  }

  test("unpinned non-current generation reports orphan-generation") {
    reclaim("fsck_v2o"); mkBase("fsck_baseo")
    publish("fsck_baseo", "fsck_v2o")
    // debris of a publisher that died after its delta write: a
    // generation directory no manifest or ledger accounts for
    assert(fs.mkdirs(whPath("fsck_v2o_delta_g9")))
    val found = checks("fsck_v2o")
    assert(found.exists(f => f._1 == "warn" && f._2 == "orphan-generation" &&
      f._3.contains("_delta_g9")), s"findings: $found")
    fs.delete(whPath("fsck_v2o_delta_g9"), true)
  }

  test("chained versions: both hops fsck clean, pins crossing versions honored") {
    reclaim("fsck_v3c", "fsck_v2c2"); mkBase("fsck_basec")
    publish("fsck_basec", "fsck_v2c2")
    val s = spark
    import s.implicits._
    ParquetSink.publishPartitionSwap(spark, "fsck_v2c2", "fsck_v3c", "bucket",
      Set("30"), Seq((10L, "j", 30L)).toDF("id", "payload", "bucket"),
      sortCols = Seq("id"))
    assert(checks("fsck_v2c2").isEmpty, checks("fsck_v2c2").toString)
    assert(checks("fsck_v3c").isEmpty, checks("fsck_v3c").toString)
  }

  test("fsckAllPublishedVersions sweeps every manifested version") {
    reclaim("fsck_va", "fsck_vb"); mkBase("fsck_basea"); mkBase("fsck_baseb")
    publish("fsck_basea", "fsck_va")
    publish("fsck_baseb", "fsck_vb")
    val victim = new org.apache.hadoop.fs.Path(
      ParquetSink.tableLocation(spark, "fsck_baseb"), "bucket=10")
    assert(fs.delete(victim, true))
    val all = ParquetSink.fsckAllPublishedVersions(spark)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(all.exists(f => f._1 == "fsck_vb" && f._3 == "partition-missing"))
    assert(!all.exists(_._1 == "fsck_va"), s"healthy version flagged: ${all.toSeq}")
  }
}
