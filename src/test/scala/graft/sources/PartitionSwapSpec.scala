package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The partition-location-swap publish must give a new table version at
  * DELTA cost: affected partitions come from a freshly written delta
  * directory, unaffected partitions reference the base table's files IN
  * PLACE — never read, rewritten, or copied. These specs prove the
  * mechanics end to end on the same (in-memory) catalog the mains run:
  * read-back equivalence to a full publish, byte-stability of the
  * unaffected files, delta-only write volume, and the emptied-partition
  * edge case.
  */
class PartitionSwapSpec extends SparkSpec {

  private def baseRows = Seq(
    (1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L),
    (4L, "d", 20L), (5L, "e", 20L),
    (6L, "f", 30L), (7L, "g", 30L),
    (8L, "h", 40L))

  private def mkBase(tbl: String): Unit = {
    val s = spark
    import s.implicits._
    ParquetSink.writePartitionedSnapshot(
      baseRows.toDF("id", "payload", "bucket"), tbl, "bucket", Seq("id"))
  }

  /** (path, length, mtime) of every data file under the partition dirs. */
  private def fileStamps(tbl: String): Map[String, (Long, Long)] = {
    val root = ParquetSink.tableLocation(spark, tbl)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (!st.getPath.getName.startsWith("_"))
          out += st.getPath.toString -> (st.getLen, st.getModificationTime)
      }
    walk(root)
    out.toMap
  }

  private def asSet(tbl: String): Set[(Long, String, Long)] =
    spark.table(tbl).select("id", "payload", "bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("swap publish ≡ full publish, with unaffected files byte-stable") {
    val s = spark
    import s.implicits._
    mkBase("pswap_base")
    val before = fileStamps("pswap_base")

    // upsert: bucket 20 gains id 9 and drops id 4; bucket 40 empties;
    // buckets 10 and 30 untouched
    val affected = Set("20", "40")
    val delta = Seq((5L, "e", 20L), (9L, "i", 20L))
      .toDF("id", "payload", "bucket")
    ParquetSink.publishPartitionSwap(spark, "pswap_base", "pswap_v2",
      "bucket", affected, delta)

    val want = baseRows.toSet --
      Set((4L, "d", 20L), (8L, "h", 40L)) + ((9L, "i", 20L))
    assert(asSet("pswap_v2") === want)

    // base files untouched — same paths, lengths, mtimes
    assert(fileStamps("pswap_base") === before)

    // v2's unaffected partitions resolve INTO the base directory (shared
    // files, not copies); delta dir holds ONLY the affected partition
    // inputFiles render as file:// URIs; compare on the path suffix
    val baseLoc = ParquetSink.tableLocation(spark, "pswap_base").toUri.getPath
    val deltaLoc = ParquetSink.tableLocation(spark, "pswap_v2_delta")
    val fs = deltaLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltaDirs = fs.listStatus(deltaLoc)
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(deltaDirs === Set("bucket=20"))
    val v2Files = spark.table("pswap_v2").inputFiles
    assert(v2Files.exists(f => new java.net.URI(f).getPath.startsWith(baseLoc)),
      s"unaffected partitions should read base files in place: ${v2Files.toSeq}")
    assert(!v2Files.exists(_.contains("bucket=40")),
      "emptied partition must vanish from v2")
  }

  test("partition filters prune v2 to single directories") {
    val s = spark
    import s.implicits._
    mkBase("pswap_base2")
    ParquetSink.publishPartitionSwap(spark, "pswap_base2", "pswap_v2b",
      "bucket", Set("10"), Seq((1L, "z", 10L)).toDF("id", "payload", "bucket"))
    val pruned = spark.table("pswap_v2b").filter(col("bucket") === 30L)
    assert(pruned.inputFiles.forall(_.contains("bucket=30")),
      s"expected partition pruning, scanned: ${pruned.inputFiles.toSeq}")
    assert(pruned.select("id").collect().map(_.getLong(0)).toSet === Set(6L, 7L))
  }

  test("republish over an existing v2 is clean (idempotent re-run)") {
    val s = spark
    import s.implicits._
    mkBase("pswap_base3")
    val delta = Seq((9L, "i", 20L)).toDF("id", "payload", "bucket")
    ParquetSink.publishPartitionSwap(spark, "pswap_base3", "pswap_v2c",
      "bucket", Set("20"), delta)
    val first = asSet("pswap_v2c")
    ParquetSink.publishPartitionSwap(spark, "pswap_base3", "pswap_v2c",
      "bucket", Set("20"), delta)
    assert(asSet("pswap_v2c") === first)
  }
}
